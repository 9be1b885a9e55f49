"""Shape/semantics unit tests for the nn blocks (slim-suite style,
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.nn import (
    GLU, glu, CANet, VCNet, Block3x3Relu, DownBlock, EncodeBy16, ResBlock,
    UpBlock)
from text2img_ekl_tpu.nn.blocks import Block3x3LeakyRelu, upsample_nearest_2x

RNG = jax.random.PRNGKey(0)
F32 = jnp.float32


def test_glu_halves_channels_and_gates():
    x = jax.random.normal(RNG, (2, 8))
    out = glu(x)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(x[:, :4] * jax.nn.sigmoid(x[:, 4:])), rtol=1e-6)


def test_glu_odd_channels_asserts():
    with pytest.raises(AssertionError):
        glu(jnp.zeros((2, 7)))


def test_upsample_nearest():
    x = jnp.arange(4, dtype=F32).reshape(1, 2, 2, 1)
    y = upsample_nearest_2x(x)
    assert y.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(y[0, :2, :, 0]),
                                  [[0, 0, 1, 1], [0, 0, 1, 1]])
    np.testing.assert_array_equal(np.asarray(y[0, 2:, :2, 0]),
                                  [[2, 2], [2, 2]])


def _run(mod, x, train=True):
    vs = mod.init({'params': RNG}, x, train)
    out, _ = mod.apply(vs, x, train, mutable=['batch_stats'])
    return out


def test_upblock_doubles_spatial():
    out = _run(UpBlock(8, dtype=F32), jnp.ones((2, 4, 4, 16)))
    assert out.shape == (2, 8, 8, 8)


def test_resblock_keeps_shape():
    out = _run(ResBlock(16, dtype=F32), jax.random.normal(RNG, (2, 8, 8, 16)))
    assert out.shape == (2, 8, 8, 16)


def test_block3x3_relu_keeps_spatial():
    out = _run(Block3x3Relu(8, dtype=F32), jnp.ones((2, 8, 8, 4)))
    assert out.shape == (2, 8, 8, 8)


def test_downblock_halves_spatial():
    out = _run(DownBlock(32, dtype=F32), jnp.ones((2, 16, 16, 16)))
    assert out.shape == (2, 8, 8, 32)


def test_encode16_shrinks_16x_channels_8ndf():
    out = _run(EncodeBy16(ndf=16, dtype=F32), jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 4, 4, 128)


def test_leaky_relu_block_negative_slope():
    mod = Block3x3LeakyRelu(4, dtype=F32)
    x = jax.random.normal(RNG, (2, 4, 4, 4))
    out = _run(mod, x)
    assert out.shape == (2, 4, 4, 4)


def test_ca_net_shapes_and_reparam():
    ca = CANet(ef_dim=16, dtype=F32)
    x = jax.random.normal(RNG, (4, 64))
    vs = ca.init({'params': RNG, 'reparam': RNG}, x, True)
    c, mu, logvar, std = ca.apply(vs, x, True, rngs={'reparam': RNG})
    assert c.shape == mu.shape == logvar.shape == std.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(std),
                               np.exp(0.5 * np.asarray(logvar)), rtol=1e-5)


def test_vc_net_shapes():
    vc = VCNet(manifd_dim=8, dtype=F32)
    noise = jax.random.normal(RNG, (4, 10))
    cond = jax.random.normal(RNG, (4, 6))
    vs = vc.init({'params': RNG, 'reparam': RNG}, noise, cond, True)
    out, _ = vc.apply(vs, noise, cond, True, rngs={'reparam': RNG},
                      mutable=['batch_stats'])
    c, mu, logvar, std = out
    assert c.shape == (4, 8)


def test_vc_net_truncated_eval_sampling():
    vc = VCNet(manifd_dim=64, truncation_threshold=1.0, dtype=F32)
    noise = jax.random.normal(RNG, (8, 10))
    cond = jax.random.normal(RNG, (8, 6))
    vs = vc.init({'params': RNG, 'reparam': RNG}, noise, cond, True)
    # eval mode with threshold: seed is truncated to [-1, 1], so
    # |c - mu| <= std everywhere
    c, mu, logvar, std = vc.apply(vs, noise, cond, False,
                                  rngs={'reparam': RNG})
    assert np.all(np.abs(np.asarray(c - mu)) <= np.asarray(std) + 1e-5)


def test_batchnorm_train_normalizes_batch():
    mod = Block3x3Relu(4, dtype=F32)
    x = jax.random.normal(RNG, (8, 4, 4, 2)) * 3 + 1
    vs = mod.init({'params': RNG}, x, True)
    out, state = mod.apply(vs, x, True, mutable=['batch_stats'])
    # running stats moved toward batch stats
    stats = jax.tree.leaves(state['batch_stats'])
    assert any(np.abs(np.asarray(s)).sum() > 0 for s in stats)


def test_joint_conv_split_matches_concat():
    """The tile-free joint conv (_JointConv3x3) is an EXACT rewrite of
    conv3x3(concat(tile(c), h)): same params (byte-identical tree, same
    init stream), same output, including the zero-pad border classes."""
    from text2img_ekl_tpu.nn import blocks
    from text2img_ekl_tpu.nn.blocks import Block3x3Relu

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    h = jax.random.normal(k1, (2, 8, 8, 6))
    c = jax.random.normal(k2, (2, 10))
    blk = Block3x3Relu(4, dtype=jnp.float32)

    split_vars = blk.init({'params': k3}, h, train=True, c_vec=c)
    tiled = jnp.broadcast_to(c[:, None, None, :], (2, 8, 8, 10))
    cat = jnp.concatenate([tiled, h], axis=-1)
    concat_vars = blk.init({'params': k3}, cat, train=True)

    # identical parameter trees (same path, shape, and init values)
    jax.tree.map(np.testing.assert_array_equal,
                 split_vars['params'], concat_vars['params'])

    y_split, _ = blk.apply(split_vars, h, train=True, c_vec=c,
                           mutable=['batch_stats'])
    y_cat, _ = blk.apply(concat_vars, cat, train=True,
                         mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y_split), np.asarray(y_cat),
                               rtol=1e-5, atol=1e-5)


def test_next_stage_g_split_flag_equivalence():
    """NextStageG output is independent of the SPLIT_JOINT_CONV flag."""
    from text2img_ekl_tpu.nn import blocks
    from text2img_ekl_tpu.models.generator import NextStageG

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    h = jax.random.normal(k1, (2, 8, 8, 8))
    c = jax.random.normal(k2, (2, 12))
    net = NextStageG(ngf=8, ef_dim=12, num_residual=1, dtype=jnp.float32)

    old = blocks.SPLIT_JOINT_CONV
    try:
        blocks.SPLIT_JOINT_CONV = True
        v1 = net.init({'params': k3}, h, c, train=True)
        y1, _ = net.apply(v1, h, c, train=True, mutable=['batch_stats'])
        blocks.SPLIT_JOINT_CONV = False
        v2 = net.init({'params': k3}, h, c, train=True)
        y2, _ = net.apply(v2, h, c, train=True, mutable=['batch_stats'])
    finally:
        blocks.SPLIT_JOINT_CONV = old
    jax.tree.map(np.testing.assert_array_equal, v1['params'], v2['params'])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
