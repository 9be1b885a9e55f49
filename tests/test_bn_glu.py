"""Fused BN+GLU epilogue: numeric parity and checkpoint compatibility.

The fused path (ops/bn_glu.py via blocks.bn_glu) must produce the same
outputs, the same running-statistics updates, the same gradients, and an
IDENTICAL parameter tree as the plain BatchNorm -> glu chain. Runs in
Pallas interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2img_ekl_tpu.nn import blocks
from text2img_ekl_tpu.ops.bn_glu import bn_glu_reference, fused_bn_glu


@pytest.fixture
def restore_flag():
    old = blocks.FUSED_BN_GLU
    yield
    blocks.FUSED_BN_GLU = old


def test_fused_op_matches_reference():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    y = jax.random.normal(ks[0], (4, 6, 6, 32), jnp.float32)
    mean = jax.random.normal(ks[1], (32,)) * 0.1
    var = jax.random.uniform(ks[2], (32,), minval=0.5, maxval=1.5)
    scale = 1.0 + 0.1 * jax.random.normal(ks[3], (32,))
    bias = 0.1 * jax.random.normal(ks[4], (32,))
    ref = bn_glu_reference(y, mean, var, scale, bias)
    out = fused_bn_glu(y, mean, var, scale, bias, jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # non-multiple-of-block row counts exercise the pad path
    y2 = jax.random.normal(ks[0], (3, 5, 7, 16), jnp.bfloat16)
    ref2 = bn_glu_reference(y2, mean[:16], var[:16], scale[:16], bias[:16])
    out2 = fused_bn_glu(y2, mean[:16], var[:16], scale[:16], bias[:16],
                        jnp.float32, True)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_fused_op_gradients_match():
    rng = jax.random.PRNGKey(1)
    ks = jax.random.split(rng, 5)
    y = jax.random.normal(ks[0], (2, 4, 4, 16), jnp.float32)
    mean = jnp.zeros((16,))
    var = jnp.ones((16,))
    scale = 1.0 + 0.1 * jax.random.normal(ks[3], (16,))
    bias = 0.1 * jax.random.normal(ks[4], (16,))

    def loss_ref(y, s, b):
        return jnp.sum(bn_glu_reference(y, mean, var, s, b) ** 2)

    def loss_fused(y, s, b):
        return jnp.sum(fused_bn_glu(y, mean, var, s, b,
                                    jnp.float32, True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(y, scale, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(y, scale, bias)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _run_upblock(fused, x, train=True):
    blocks.FUSED_BN_GLU = fused
    blocks.BN_DTYPE = jnp.float32
    m = blocks.UpBlock(8, dtype=jnp.float32)
    vs = m.init({'params': jax.random.PRNGKey(0)}, x, train=True)
    if train:
        out, mut = m.apply(vs, x, train=True, mutable=['batch_stats'])
        return vs, out, mut['batch_stats']
    return vs, m.apply(vs, x, train=False), None


def test_upblock_fused_matches_plain_train_and_eval(restore_flag):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4), jnp.float32)
    vs_p, out_p, bs_p = _run_upblock(False, x)
    vs_f, out_f, bs_f = _run_upblock(True, x)
    # identical parameter/variable trees (checkpoint compatibility)
    import flax
    flat_p = flax.traverse_util.flatten_dict(vs_p)
    flat_f = flax.traverse_util.flatten_dict(vs_f)
    assert set(flat_p) == set(flat_f), (
        set(flat_p) ^ set(flat_f))
    for k in flat_p:
        np.testing.assert_allclose(np.asarray(flat_p[k]),
                                   np.asarray(flat_f[k]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    # running statistics advance identically
    fp = flax.traverse_util.flatten_dict(bs_p)
    ff = flax.traverse_util.flatten_dict(bs_f)
    assert set(fp) == set(ff)
    for k in fp:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fp[k]),
                                   rtol=1e-5, atol=1e-6)
    # eval mode (running averages) matches too
    _, ev_p, _ = _run_upblock(False, x, train=False)
    _, ev_f, _ = _run_upblock(True, x, train=False)
    np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_p),
                               rtol=1e-5, atol=1e-5)


def test_full_generator_fused_matches_plain(restore_flag):
    """Flagship generator forward with the flag on == off (f32)."""
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_generator
    cfg = cfg_from_file(
        '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    cfg.GAN.GF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_BN_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    B = 2
    noise = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.GAN.Z_DIM))
    sen = jax.random.normal(jax.random.PRNGKey(4),
                            (B, cfg.TEXT.DIMENSION)) * 0.1
    cls = jax.nn.one_hot(jnp.arange(B), cfg.GAN.ENTITY_DIM)
    rngs = {'params': jax.random.PRNGKey(0),
            'reparam': jax.random.PRNGKey(5),
            'cls_prior': jax.random.PRNGKey(6)}

    outs = {}
    for fused in (False, True):
        cfg.TPU_FUSED_BN_GLU = fused
        G = build_generator(cfg)
        vs = jax.jit(lambda r, *a: G.init(r, *a, train=True,
                                          method='init_all'))(
            rngs, noise, sen, cls)
        (hcodes, *_), _ = G.apply(
            vs, noise, sen, cls, train=True,
            rngs={'reparam': jax.random.PRNGKey(5),
                  'cls_prior': jax.random.PRNGKey(6)},
            mutable=['batch_stats'])
        imgs = G.apply(vs, hcodes, method='image')
        outs[fused] = np.asarray(imgs[-1], np.float32)
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-4, atol=1e-4)
