"""Fused BatchNorm-normalize + GLU epilogue (Pallas TPU).

Every generator up-sampling / 3x3 block ends conv -> BN -> GLU
(reference upBlock model.py:87-94, Block3x3_relu model.py:98-104). On TPU
the conv's epilogue already produces the batch statistics fused
(XLA's convert_reduce_fusion), but the *normalize* pass then materializes
the full-width normalized tensor — a full read+write of the conv output —
before GLU halves the channels (profiled on the 3-stage step: the
h_net3/upsample normalize alone is ~1.6 ms/step at bs64, PERF.md round 3).

This op fuses normalize + GLU into ONE pass: read y [.., 2C] once, write
the gated z [.., C] once. The backward recomputes through the pure-JAX
reference composition under jax.custom_vjp (same traffic as XLA's own
backward, which re-reads y anyway).

Numerics follow flax nn.BatchNorm with our defaults: statistics are
computed OUTSIDE (so XLA keeps fusing them into the conv), the kernel
applies (y - mean) * rsqrt(var + eps) * scale + bias in the configured BN
compute dtype, then a * sigmoid(b) over the channel halves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def bn_glu_reference(y, mean, var, scale, bias, compute_dtype=jnp.float32):
    """Pure-JAX composition (the exact chain blocks.BatchNorm + glu runs):
    normalize in ``compute_dtype`` with f32 inv/scale folding, then GLU."""
    cd = compute_dtype
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + _EPS) * \
        scale.astype(jnp.float32)
    k = inv.astype(cd)
    b = (bias.astype(jnp.float32) -
         mean.astype(jnp.float32) * inv).astype(cd)
    xn = y.astype(cd) * k + b
    c = xn.shape[-1] // 2
    return (xn[..., :c] * jax.nn.sigmoid(xn[..., c:])).astype(y.dtype)


def _fwd_kernel(y_ref, k_ref, b_ref, o_ref, *, c_half, compute_dtype):
    y = y_ref[...]
    k = k_ref[...].astype(compute_dtype)     # [1, 2C]
    b = b_ref[...].astype(compute_dtype)     # [1, 2C]
    xn = y.astype(compute_dtype) * k + b
    a = xn[:, :c_half]
    # the logistic runs in f32: Mosaic's bf16 'logistic' lowering fails
    # verification ('vector.broadcast' element-type mismatch), and f32
    # here is register-only work
    g = xn[:, c_half:].astype(jnp.float32)
    o_ref[...] = (a.astype(jnp.float32) *
                  jax.nn.sigmoid(g)).astype(o_ref.dtype)


def _fused_fwd(y2, k, b, compute_dtype, block_rows=2048,
               interpret=False):
    """y2: [M, 2C]; k/b: [2C] folded affine -> [M, C]."""
    m, c2 = y2.shape
    c = c2 // 2
    rows = min(block_rows, m)
    # pad rows to a multiple of the block
    pad = (-m) % rows
    if pad:
        y2 = jnp.pad(y2, ((0, pad), (0, 0)))
    grid = (y2.shape[0] // rows,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c_half=c,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((y2.shape[0], c), y2.dtype),
        interpret=interpret,
    )(y2, k[None, :], b[None, :])
    return out[:m] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_bn_glu(y, mean, var, scale, bias, compute_dtype=jnp.float32,
                 interpret=False):
    """Fused normalize+GLU. y: [..., 2C]; mean/var/scale/bias: [2C]."""
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + _EPS) * \
        scale.astype(jnp.float32)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    shp = y.shape
    z2 = _fused_fwd(y.reshape(-1, shp[-1]), inv, b, compute_dtype,
                    interpret=interpret)
    return z2.reshape(shp[:-1] + (shp[-1] // 2,))


def _fwd_rule(y, mean, var, scale, bias, compute_dtype, interpret):
    z = fused_bn_glu(y, mean, var, scale, bias, compute_dtype, interpret)
    return z, (y, mean, var, scale, bias)


def _bwd_rule(compute_dtype, interpret, res, dz):
    y, mean, var, scale, bias = res
    _, vjp = jax.vjp(
        lambda *a: bn_glu_reference(*a, compute_dtype=compute_dtype),
        y, mean, var, scale, bias)
    return vjp(dz)


fused_bn_glu.defvjp(_fwd_rule, _bwd_rule)
