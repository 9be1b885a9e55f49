"""Pallas TPU weight-gradient kernel for 3x3 stride-1 SAME convolutions.

Why this exists (PERF.md "Headroom"): the generator's upper stages run
3x3 convs at C=32/64 input channels over large spatial maps. XLA's
weight-gradient (dW) emitter for those shapes is structurally
lane-underfilled — the 3-stage profile measured h_net3's upsample dW at
3.36 ms / 12% MXU / 29% HBM ("serialization-limited small-output
reduction"), and the flagship's h_net2 dW class at 47% MXU. The dW
output is tiny ((3,3,C,F)) while the reduction streams the whole
activation pair, so the right design is a streaming reduction that
keeps the MXU fed:

  * grid over (batch, row-tiles); each step streams one x slab and one
    dy slab through VMEM exactly once — HBM traffic is the roofline
    minimum (read x + read dy, no im2col materialization in HBM). The
    1-row halo each side comes from two extra single-row blocked
    fetches (Mosaic's Element/padding path is unimplemented, and the
    halo rows re-read only 2/tile of x);
  * in VMEM the three column taps are lane-stacked into X3
    ``[rows, W, 3C]`` (shifted sublane stores; columns -1/W are the
    conv's own SAME zero padding), and the three ROW taps are
    lane-stacked into Y3 ``[rows, W, 3F]``, so the whole 3x3 dW update
    of a slab is ONE ``[K, 3C] x [K, 3F]`` MXU contraction — output
    stationarity per MXU pass is (3C/128)*(3F/128), 9x the naive
    per-tap loop's (C/128)*(F/128);
  * partial sums accumulate in a float32 VMEM block revisited across
    all grid steps (better precision than the bf16 dW the XLA autodiff
    path emits), written back once.

Correctness of the ky stack: with the contraction indexed by the x-row
u = h*tile - 1 + ul (ul over the tile+2-row slab), tap ky pairs x row u
with dy row u - ky + 1, which lies in this step's dy tile iff
ky <= ul < ky + tile. So Y3[ul, :, ky*F+f] = dy[ul - ky] on exactly
that band and 0 outside — three shifted stores, no dy halo, no double
counting across grid steps.

The public entry is :func:`conv3x3_dw` — a drop-in
``lax.conv_general_dilated`` forward whose ``jax.custom_vjp`` backward
computes dx with the standard XLA transpose conv and dW with the Pallas
kernel. Geometry outside the kernel's profitable/supported envelope
(see :func:`dw_supported`) falls back to plain autodiff.

Reference context: the torch reference relies on cuDNN's wgrad kernels
(implicit in ``errD.backward()`` / ``errGs.backward()``,
cub_trainer_splitz_cap_ca.py:453,607); this is the TPU-native
equivalent for the shapes XLA handles poorly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile per grid step, keyed by spatial width. The chip sweep
# (tools/bench_dw.py, tiles {16,32,64,128}) measured runtime nearly FLAT
# in tile size (<5% spread — the kernel is limited by the in-VMEM
# tap-stacking copies, not grid overhead; PERF.md "Pallas dW kernel"),
# so these defaults just keep the slab set comfortably inside VMEM.
_TILE_FOR_W = {32: 32, 64: 64, 128: 128, 256: 64, 512: 16}

# Mosaic's default scoped-vmem limit is 16 MB; the reshape copies the
# dot_generals take push past it at W=256. 64 MB is the limit
# capsule_pallas measured safe on this chip (capsule_pallas.py:271).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _tile_for(H: int, W: int, tile: int = 0) -> int:
    return tile or _TILE_FOR_W[W]


def dw_supported(H: int, W: int, C: int, F: int, tile: int = 0) -> bool:
    """The envelope where the Pallas dW wins over XLA's emitter.

    Square maps >= 32 px (smaller maps have C>=128 in every config and
    XLA's fill is already fine there), C <= 64 (the lane-underfilled
    class), and row tiles dividing H. W must be a multiple of 8 so the
    in-kernel [T, W, C] -> [T*W, C] reshape is a pure sublane merge.
    """
    return (H == W and W in _TILE_FOR_W and C <= 64 and
            H % _tile_for(H, W, tile) == 0 and W % 8 == 0 and F % 8 == 0)


def _fill_x3(x_ref, xt_ref, xb_ref, x3_ref, *, tile: int, W: int, C: int):
    """Assemble X3[ul, j, kx*C+c] = x[h*tile - 1 + ul, j+kx-1, c].

    The halo rows (ul = 0 and tile+1) come from the single-row fetches
    xt/xb (zeroed at the image edges, where their clamped block index
    re-reads an in-image row that must not contribute); columns -1 / W
    are the conv's SAME zero padding, so the edge column taps are
    shifted sublane stores plus an explicit zero column.
    """
    h = pl.program_id(1)
    nh = pl.num_programs(1)
    zrow = jnp.zeros((1, W, C), x_ref.dtype)
    top = jnp.where(h == 0, zrow, xt_ref[0])
    bot = jnp.where(h == nh - 1, zrow, xb_ref[0])
    zcol = jnp.zeros((tile + 2, 1, C), x_ref.dtype)

    for kx in range(3):
        lane = slice(kx * C, (kx + 1) * C)
        # Column tap kx reads x columns [kx-1, kx-1+W) clipped to [0, W).
        src = slice(max(0, kx - 1), min(W, W + kx - 1))
        dst = slice(max(0, 1 - kx), min(W, W + 1 - kx))
        x3_ref[0:1, dst, lane] = top[:, src, :]
        x3_ref[1:tile + 1, dst, lane] = x_ref[0, :, src, :]
        x3_ref[tile + 1:tile + 2, dst, lane] = bot[:, src, :]
        if kx == 0:
            x3_ref[:, 0:1, lane] = zcol
        elif kx == 2:
            x3_ref[:, W - 1:W, lane] = zcol


def _dw_kernel(x_ref, xt_ref, xb_ref, dy_ref, out_ref, x3_ref, *,
               tile: int, H: int, W: int, C: int, F: int):
    """Per-row-tap variant (v1): three [K, 3C] x [K, F] contractions."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    _fill_x3(x_ref, xt_ref, xb_ref, x3_ref, tile=tile, W=W, C=C)

    @pl.when(jnp.logical_and(b == 0, h == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dy = dy_ref[0].reshape(tile * W, F)
    for ky in range(3):
        xk = x3_ref[ky:ky + tile, :, :].reshape(tile * W, 3 * C)
        out_ref[ky] += jax.lax.dot_general(
            xk, dy, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _dw_kernel_v2(x_ref, xt_ref, xb_ref, dy_ref, out_ref, x3_ref, y3_ref,
                  *, tile: int, H: int, W: int, C: int, F: int):
    """Single-contraction variant (v2): ONE [K, 3C] x [K, 3F] matmul."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    _fill_x3(x_ref, xt_ref, xb_ref, x3_ref, tile=tile, W=W, C=C)

    # Tap ky occupies rows [ky, ky+tile); its complement within the
    # tile+2-row slab is covered by rows {0,1} and {tile, tile+1}.
    zy = jnp.zeros((2, W, 3 * F), dy_ref.dtype)
    y3_ref[0:2, :, :] = zy
    y3_ref[tile:tile + 2, :, :] = zy
    for ky in range(3):
        y3_ref[ky:ky + tile, :, ky * F:(ky + 1) * F] = dy_ref[0]

    @pl.when(jnp.logical_and(b == 0, h == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    xk = x3_ref[...].reshape((tile + 2) * W, 3 * C)
    yk = y3_ref[...].reshape((tile + 2) * W, 3 * F)
    out_ref[...] += jax.lax.dot_general(
        xk, yk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _x_specs(tile: int, W: int, C: int, H: int):
    """Blocked specs for the x tile and its two single-row halo fetches.

    Block indices are clamped at the image edges (the kernel zeroes the
    out-of-image halo rows), so every fetch stays in bounds.
    """
    return [
        pl.BlockSpec((1, tile, W, C), lambda b, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, W, C),
                     lambda b, h: (b, jnp.maximum(h * tile - 1, 0), 0, 0)),
        pl.BlockSpec((1, 1, W, C),
                     lambda b, h: (b, jnp.minimum((h + 1) * tile, H - 1),
                                   0, 0)),
    ]


@functools.partial(jax.jit, static_argnames=('interpret', 'tile'))
def dw3x3(x: jnp.ndarray, dy: jnp.ndarray,
          interpret: bool = False, tile: int = 0) -> jnp.ndarray:
    """Weight gradient of a 3x3 stride-1 pad-1 bias-free NHWC conv.

    x [B, H, W, C], dy [B, H, W, F] -> dW [3, 3, C, F] float32.
    """
    B, H, W, C = x.shape
    F = dy.shape[-1]
    assert dy.shape[:3] == (B, H, W), (x.shape, dy.shape)
    assert dw_supported(H, W, C, F, tile), (x.shape, dy.shape)
    tile = _tile_for(H, W, tile)

    out = pl.pallas_call(
        functools.partial(_dw_kernel, tile=tile, H=H, W=W, C=C, F=F),
        grid=(B, H // tile),
        in_specs=_x_specs(tile, W, C, H) + [
            pl.BlockSpec((1, tile, W, F), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3, 3 * C, F), lambda b, h: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((3, 3 * C, F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile + 2, W, 3 * C), x.dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, x, x, dy)
    # [ky, kx*C + c, f] -> [ky, kx, c, f]
    return out.reshape(3, 3, C, F)


@functools.partial(jax.jit, static_argnames=('interpret', 'tile'))
def dw3x3_v2(x: jnp.ndarray, dy: jnp.ndarray,
             interpret: bool = False, tile: int = 0) -> jnp.ndarray:
    """Weight gradient via the single-contraction kernel (see
    :func:`_dw_kernel_v2`). Same contract as :func:`dw3x3`."""
    B, H, W, C = x.shape
    F = dy.shape[-1]
    assert dy.shape[:3] == (B, H, W), (x.shape, dy.shape)
    assert dw_supported(H, W, C, F, tile), (x.shape, dy.shape)
    tile = _tile_for(H, W, tile)

    out = pl.pallas_call(
        functools.partial(_dw_kernel_v2, tile=tile, H=H, W=W, C=C, F=F),
        grid=(B, H // tile),
        in_specs=_x_specs(tile, W, C, H) + [
            pl.BlockSpec((1, tile, W, F), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * C, 3 * F), lambda b, h: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * C, 3 * F), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile + 2, W, 3 * C), x.dtype),
                        pltpu.VMEM((tile + 2, W, 3 * F), dy.dtype)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(x, x, x, dy)
    # [kx*C + c, ky*F + f] -> [ky, kx, c, f]
    return out.reshape(3, C, 3, F).transpose(2, 0, 1, 3)


def dw3x3_xla(x: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """XLA formulation of the same dW (parity reference): a conv with
    batch as the contracting feature dimension."""
    # dW[ky,kx,c,f] = sum_{n,y,x} X[n, y+ky-1, x+kx-1, c] dY[n,y,x,f]
    out = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0),           # [C, H, W, B] as NHWC
        dy.transpose(1, 2, 0, 3),          # [H, W, B, F] as HWIO
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    return out.transpose(1, 2, 0, 3)       # [C,3,3,F] -> [3,3,C,F]


@jax.custom_vjp
def conv3x3_dw(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 pad-1 bias-free NHWC conv (identical forward op to
    flax nn.Conv) whose backward computes dW with the Pallas kernel.

    ``w`` is the float32 parameter; the compute-dtype cast happens
    inside so the dW cotangent accumulates and returns in float32
    (the plain autodiff path round-trips dW through bfloat16).
    """
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def _conv3x3_dw_fwd(x, w):
    return conv3x3_dw(x, w), (x, w)


def _conv3x3_dw_bwd(res, dy):
    x, w = res
    wb = w.astype(x.dtype)
    # dx: correlate dy with the spatially-flipped, in/out-swapped kernel
    # (exactly the conv XLA's own transpose rule emits).
    dx = jax.lax.conv_general_dilated(
        dy, jnp.flip(wb, (0, 1)).swapaxes(2, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    interpret = jax.default_backend() != 'tpu'
    dw = dw3x3_v2(x, dy, interpret=interpret).astype(w.dtype)
    return dx, dw


conv3x3_dw.defvjp(_conv3x3_dw_fwd, _conv3x3_dw_bwd)
