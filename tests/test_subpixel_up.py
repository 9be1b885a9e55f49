"""Subpixel UpBlock (TPU_SUBPIXEL_UP): exactness + checkpoint identity.

The fold path computes conv3x3(up2x(x)) as depth_to_space(conv3x3(x, W4))
with W4 built from 2D partial sums of W per output parity
(blocks.fold_up2x_kernel). It must produce the same outputs, the same
running-statistics updates, the same gradients, and an IDENTICAL
parameter tree as the plain upsample+conv path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from text2img_ekl_tpu.nn import blocks


@pytest.fixture
def restore_flag():
    old = blocks.SUBPIXEL_UP
    old_dtype = blocks.BN_DTYPE  # the helpers below force f32 BN
    yield
    blocks.SUBPIXEL_UP = old
    blocks.BN_DTYPE = old_dtype


def test_fold_kernel_exactness_incl_borders():
    """depth_to_space(conv(x, W4)) == conv(up2x(x), W) at f32, including
    the zero-padded borders (the parity-tap collapse must hold there)."""
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (2, 5, 5, 4), jnp.float32)
    W = jax.random.normal(kw, (3, 3, 4, 6), jnp.float32)
    dn = ('NHWC', 'HWIO', 'NHWC')
    hp = jax.lax.Precision.HIGHEST
    up = blocks.upsample_nearest_2x(x)
    ref = jax.lax.conv_general_dilated(
        up, W, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn, precision=hp)
    y4 = jax.lax.conv_general_dilated(
        x, blocks.fold_up2x_kernel(W), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn, precision=hp)
    b, h, w, _ = y4.shape
    y = y4.reshape(b, h, w, 2, 2, 6).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, 2 * h, 2 * w, 6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _run_upblock(fold, x, train=True):
    blocks.SUBPIXEL_UP = fold
    blocks.BN_DTYPE = jnp.float32
    m = blocks.UpBlock(8, dtype=jnp.float32)
    vs = m.init({'params': jax.random.PRNGKey(0)}, x, train=True)
    if train:
        out, mut = m.apply(vs, x, train=True, mutable=['batch_stats'])
        return vs, out, mut['batch_stats']
    return vs, m.apply(vs, x, train=False), None


def test_upblock_fold_matches_plain(restore_flag):
    import flax
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4), jnp.float32)
    vs_p, out_p, bs_p = _run_upblock(False, x)
    vs_f, out_f, bs_f = _run_upblock(True, x)
    # identical parameter/variable trees (checkpoint + init-RNG identity)
    flat_p = flax.traverse_util.flatten_dict(vs_p)
    flat_f = flax.traverse_util.flatten_dict(vs_f)
    assert set(flat_p) == set(flat_f), set(flat_p) ^ set(flat_f)
    for k in flat_p:
        np.testing.assert_allclose(np.asarray(flat_p[k]),
                                   np.asarray(flat_f[k]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=1e-5, atol=1e-5)
    fp = flax.traverse_util.flatten_dict(bs_p)
    ff = flax.traverse_util.flatten_dict(bs_f)
    for k in fp:
        np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fp[k]),
                                   rtol=1e-5, atol=1e-6)
    # eval-mode calls bypass the fold (forward-only is slower) but must
    # agree anyway — same parameters, exact rewrite.
    _, ev_p, _ = _run_upblock(False, x, train=False)
    _, ev_f, _ = _run_upblock(True, x, train=False)
    np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_p),
                               rtol=1e-5, atol=1e-5)


def test_upblock_fold_gradients_match(restore_flag):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 4), jnp.float32)

    def grads(fold):
        blocks.SUBPIXEL_UP = fold
        blocks.BN_DTYPE = jnp.float32
        m = blocks.UpBlock(8, dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, x, train=True)

        def loss(params, x):
            out, _ = m.apply({'params': params,
                              'batch_stats': vs['batch_stats']},
                             x, train=True, mutable=['batch_stats'])
            return jnp.sum(out ** 2)

        return jax.grad(loss, argnums=(0, 1))(vs['params'], x)

    gp, gf = grads(False), grads(True)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_full_generator_fold_matches_plain(restore_flag):
    """Flagship generator train forward with the flag on == off (f32)."""
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
    for fold in (False, True):
        cfg.TPU_SUBPIXEL_UP = fold
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
        outs[fold] = np.asarray(imgs[-1], np.float32)
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-4, atol=1e-4)


def test_full_train_step_fold_matches_plain(restore_flag):
    """ONE fused G+D train step with the flag on == off: same losses,
    same updated params, same fakes (f32 numerics path — the fold is an
    exact rewrite, so the whole training trajectory must be preserved
    before the default can ever flip)."""
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import (build_discriminators,
                                         build_generator)
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (cond_code_width,
                                             make_synthetic_batch)
    cfg = cfg_from_file(
        '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    # tight tolerance needs the f32 numerics path (see
    # test_train_step.py::test_gspmd_mode_matches_single_device)
    cfg.TPU_UINT8_INPUT = False
    cfg.TPU_BN_DTYPE = 'float32'

    results = {}
    for fold in (False, True):
        cfg.TPU_SUBPIXEL_UP = fold
        G = build_generator(cfg)  # applies the module-level flag
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                   cond_code_width(cfg))
        step = make_train_step(cfg, G, Ds, None)
        batch = make_synthetic_batch(cfg, 4)
        new_state, metrics, fakes = step(state, batch,
                                         jax.random.PRNGKey(1))
        results[fold] = dict(
            metrics={k: float(v) for k, v in metrics.items()},
            g1=np.asarray(jax.tree.leaves(new_state.g_params)[0]),
            fakes=np.asarray(fakes))
    for k, v in results[False]['metrics'].items():
        np.testing.assert_allclose(results[True]['metrics'][k], v,
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(results[True]['g1'], results[False]['g1'],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(results[True]['fakes'],
                               results[False]['fakes'], atol=1e-4)
