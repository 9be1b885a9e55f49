"""Pallas 3x3 weight-gradient kernel: parity vs XLA (interpret mode).

The kernel's tricky parts are all edge behavior — the 1-row halo
fetches with clamped block indices, the SAME zero column taps, and the
shifted ky band stores in v2 — so random inputs at several geometries
(including tile==H, a single grid step per image) exercise every
branch. The XLA formulation ``dw3x3_xla`` is itself checked against
``jax.grad`` of the plain conv.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.ops import conv_dw


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_xla_formulation_matches_autodiff():
    x = _rand((2, 16, 16, 4), 0)
    w = _rand((3, 3, 4, 8), 1) * 0.1
    dy = _rand((2, 16, 16, 8), 2)

    def fwd(w_):
        return jax.lax.conv_general_dilated(
            x, w_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    _, vjp = jax.vjp(fwd, w)
    (dw_ref,) = vjp(dy)
    dw = conv_dw.dw3x3_xla(x, dy)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('geom', [
    # (B, H, W, C, F, tile): tile=0 -> the default for W.
    (2, 32, 32, 16, 24, 0),
    (1, 64, 64, 8, 8, 0),
    (2, 32, 32, 8, 16, 8),     # several grid steps per image
    (1, 32, 32, 16, 8, 32),    # full-image tile: one step, no halo reuse
    (3, 64, 64, 32, 32, 16),
])
@pytest.mark.parametrize('variant', ['v1', 'v2'])
def test_pallas_dw_matches_xla(geom, variant):
    B, H, W, C, F, tile = geom
    assert conv_dw.dw_supported(H, W, C, F, tile)
    x = _rand((B, H, W, C), 3)
    dy = _rand((B, H, W, F), 4)
    fn = conv_dw.dw3x3 if variant == 'v1' else conv_dw.dw3x3_v2
    dw = fn(x, dy, interpret=True, tile=tile)
    dw_ref = conv_dw.dw3x3_xla(x, dy)
    rel = float(jnp.abs(dw - dw_ref).max() /
                (jnp.abs(dw_ref).max() + 1e-12))
    assert rel < 1e-5, (geom, variant, rel)


def test_dw_supported_envelope():
    assert conv_dw.dw_supported(128, 128, 64, 64)
    assert not conv_dw.dw_supported(128, 128, 128, 64)   # C too big
    assert not conv_dw.dw_supported(64, 128, 64, 64)     # non-square
    assert not conv_dw.dw_supported(48, 48, 32, 32)      # W not in table
    assert not conv_dw.dw_supported(64, 64, 32, 12)      # F % 8
    assert not conv_dw.dw_supported(64, 64, 32, 32, 48)  # tile !| H


def test_custom_vjp_matches_plain_conv_grads():
    x = _rand((2, 32, 32, 8), 5).astype(jnp.bfloat16)
    w = _rand((3, 3, 8, 16), 6) * 0.1   # float32 param
    dy_seed = 7

    def loss_plain(x_, w_):
        y = jax.lax.conv_general_dilated(
            x_, w_.astype(x_.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return jnp.sum(y.astype(jnp.float32) *
                       _rand(y.shape, dy_seed))

    def loss_pallas(x_, w_):
        y = conv_dw.conv3x3_dw(x_, w_)
        return jnp.sum(y.astype(jnp.float32) * _rand(y.shape, dy_seed))

    assert np.allclose(float(loss_plain(x, w)), float(loss_pallas(x, w)))
    gx_ref, gw_ref = jax.grad(loss_plain, argnums=(0, 1))(x, w)
    gx, gw = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))(x, w)
    assert gw.dtype == jnp.float32
    # dx goes through the identical XLA transpose conv: tight bound.
    np.testing.assert_allclose(np.asarray(gx, np.float32),
                               np.asarray(gx_ref, np.float32),
                               rtol=1e-2, atol=1e-2)
    # dW: the Pallas path accumulates in f32 while the autodiff path
    # contracts bf16 cotangents — compare loosely.
    rel = float(jnp.abs(gw - gw_ref).max() /
                (jnp.abs(gw_ref).max() + 1e-12))
    assert rel < 2e-2, rel


def test_conv3x3_flag_equivalence():
    """TPU_PALLAS_DW routes Conv3x3 through the kernel with the same
    parameter tree, forward values, and (loosely) gradients."""
    from text2img_ekl_tpu.nn import blocks
    x = _rand((2, 32, 32, 16), 8).astype(jnp.bfloat16)

    def build(flag):
        old = blocks.PALLAS_DW
        blocks.PALLAS_DW = flag
        try:
            m = blocks.Conv3x3(24)
            v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        finally:
            blocks.PALLAS_DW = old
        return m, v

    m0, v0 = build(False)
    m1, v1 = build(True)
    assert jax.tree_util.tree_structure(v0) == \
        jax.tree_util.tree_structure(v1)
    np.testing.assert_array_equal(
        np.asarray(v0['params']['Conv_0']['kernel']),
        np.asarray(v1['params']['Conv_0']['kernel']))

    def run(m, v, flag):
        old = blocks.PALLAS_DW
        blocks.PALLAS_DW = flag

        def loss(v_):
            y = m.apply(v_, x)
            return jnp.sum(y.astype(jnp.float32) * _rand(y.shape, 9)), y
        try:
            (l, y), g = jax.value_and_grad(loss, has_aux=True)(v)
        finally:
            blocks.PALLAS_DW = old
        return l, y, g['params']['Conv_0']['kernel']

    l0, y0, g0 = run(m0, v0, False)
    l1, y1, g1 = run(m1, v1, True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    rel = float(jnp.abs(g1 - g0).max() / (jnp.abs(g0).max() + 1e-12))
    assert rel < 2e-2, rel

    # Unsupported geometry (C > 64) falls back to nn.Conv even with the
    # flag on: same tree, no Pallas path.
    xb = _rand((1, 32, 32, 128), 10).astype(jnp.bfloat16)
    old = blocks.PALLAS_DW
    blocks.PALLAS_DW = True
    try:
        vb = jax.jit(blocks.Conv3x3(8).init)(jax.random.PRNGKey(1), xb)
    finally:
        blocks.PALLAS_DW = old
    assert 'kernel' in vb['params']['Conv_0']
