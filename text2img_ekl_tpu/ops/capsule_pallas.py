"""Fused Pallas TPU kernel for capsule dynamic routing.

This is the TPU-native replacement for the reference's external CUDA capsule
kernels (pip ``capsule_layer``, imported at model.py:12). The whole op —
vote matmul + 3 routing iterations (softmax couplings, weighted aggregation,
squash, agreement update) — runs in VMEM per batch element, so the vote
tensor (e.g. [48, 1024, 32] for the flagship generator head) never
round-trips through HBM between iterations.

Layout choice: votes are held as u[out_length, in, out] with the *output
capsule* axis last, so every routing step (softmax over out, reductions over
in and out_length) is lane-aligned elementwise/reduce work on the VPU, and
the vote computation is out_length small MXU matmuls x[in, in_length] @
W[o][in_length, out].

The backward pass recomputes through the pure-JAX reference implementation
(ops/capsule.py) under ``jax.custom_vjp`` — forward-path HBM savings are
where the time goes in GAN training (three D forwards per step vs one
backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _routing_kernel(x_ref, w_ref, v_ref, u_scratch, *, num_iterations: int,
                    out_length: int):
    x = x_ref[0].astype(jnp.float32)          # [in, in_length]
    # votes: u[o] = x @ W[o]  -> [out_length, in, out]
    for o in range(out_length):
        u_scratch[o] = jnp.dot(x, w_ref[o].astype(jnp.float32),
                               preferred_element_type=jnp.float32)
    u = u_scratch[:]                           # [out_length, in, out]
    in_caps = u.shape[1]
    out_caps = u.shape[2]
    b = jnp.zeros((in_caps, out_caps), jnp.float32)
    # Sublane reduction via a ones-vector matmul and explicit broadcast —
    # Mosaic rejects the keepdims-sum + implicit-rebroadcast relayout here.
    ones = jnp.ones((1, out_length), jnp.float32)
    v = None
    for r in range(num_iterations):
        c = jax.nn.softmax(b, axis=1)          # over output capsules
        s = jnp.sum(u * c[None, :, :], axis=1)  # [out_length, out]
        s2 = jnp.dot(ones, s * s, preferred_element_type=jnp.float32)
        scale = s2 / (1.0 + s2) * jax.lax.rsqrt(s2 + 1e-8)
        v = s * jnp.broadcast_to(scale, s.shape)
        if r < num_iterations - 1:
            b = b + jnp.sum(u * v[:, None, :], axis=0)
    v_ref[0] = v


def _forward(x: jnp.ndarray, weight: jnp.ndarray,
             num_iterations: int) -> jnp.ndarray:
    """x [B, in, in_length], weight [out, out_length, in_length] ->
    [B, out, out_length]."""
    bsz, in_caps, in_length = x.shape
    out_caps, out_length, _ = weight.shape
    # Same VMEM discipline as _bwd: the kernel holds the full weight
    # block plus the u scratch resident; shapes past the measured 64MB
    # Mosaic ceiling fall back to the pure-JAX routing (the backward
    # would have fallen back anyway), and sets past Mosaic's default
    # budget get an explicit raised limit instead of a compile error.
    w_bytes, u_bytes, x_bytes, v_bytes = _padded_sizes(x.shape, weight.shape)
    need = w_bytes + u_bytes + x_bytes + v_bytes + 2 * 1024 * 1024
    if need > _VMEM_MAX:
        from .capsule import compute_votes, dynamic_routing
        return dynamic_routing(
            compute_votes(x.astype(jnp.float32),
                          weight.astype(jnp.float32)), num_iterations)
    extra = {}
    if need > _VMEM_DEFAULT:
        extra['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=int(need))
    # [out, out_length, in_length] -> [out_length, in_length, out]
    w_t = jnp.transpose(weight, (1, 2, 0)).astype(jnp.float32)

    grid = (bsz,)
    v = pl.pallas_call(
        functools.partial(_routing_kernel, num_iterations=num_iterations,
                          out_length=out_length),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, in_caps, in_length), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_length, in_length, out_caps),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_length, out_caps),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, out_length, out_caps),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((out_length, in_caps, out_caps), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * in_caps * in_length * out_caps * out_length
            + 6 * num_iterations * bsz * in_caps * out_caps * out_length,
            bytes_accessed=x.size * 4 + weight.size * 4
            + bsz * out_caps * out_length * 4,
            transcendentals=num_iterations * bsz * in_caps * out_caps,
        ),
        **extra,
    )(x.astype(jnp.float32), w_t)
    return jnp.transpose(v, (0, 2, 1))  # [B, out, out_length]


def _bwd_kernel(x_ref, w_ref, dv_ref, dx_ref, dw_ref, u_sc, dw_sc,
                *, num_iterations: int, out_length: int, eps: float = 1e-8):
    """Fused backward: recompute forward (votes + routing, stashing the tiny
    per-iteration couplings/outputs), then reverse through the iterations —
    the [out_length, in, out] vote tensor never leaves VMEM.

    The du tensor is never materialized: every du contribution is low-rank
    (an outer product of per-iteration row/column factors), so its pullback
    through the vote matmul reduces to small matmuls and row-scaled sums:
      du_A[o] = c  (x) ds[o]   =>  dx += c @ (sum_o ds[o] * w[o])^T,
                                    dw[o] += (x^T c) * ds[o]
      du_B[o] = db (x) v[o]    =>  same with (db, v).
    """
    R = num_iterations
    x = x_ref[0].astype(jnp.float32)              # [in, in_len]
    for o in range(out_length):
        u_sc[o] = jnp.dot(x, w_ref[o].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
    in_caps = x_ref.shape[1]
    out_caps = dv_ref.shape[2]
    in_len = x.shape[1]
    ones_ol = jnp.ones((1, out_length), jnp.float32)
    ones_in = jnp.ones((1, in_caps), jnp.float32)

    # All reductions over the vote tensor loop per output-length slice —
    # a whole-tensor `u * broadcast` materializes a second [out_len, in,
    # out] temporary and blows the 16MB VMEM budget. Sublane reductions go
    # through ones-matmuls (Mosaic rejects keepdims-sum + rebroadcast).
    def weighted_rows(m):
        """rows[o] = sum_i m[i,:] * u[o,i,:]  -> [out_len, out]."""
        rows = [jnp.dot(ones_in, u_sc[o] * m,
                        preferred_element_type=jnp.float32)
                for o in range(out_length)]
        return jnp.concatenate(rows, axis=0)

    def col_sum(rowsm):
        """acc = sum_o u[o] * rowsm[o]_broadcast -> [in, out]."""
        acc = jnp.zeros((in_caps, out_caps), jnp.float32)
        for o in range(out_length):
            acc = acc + u_sc[o] * jnp.broadcast_to(
                rowsm[o:o + 1], (in_caps, out_caps))
        return acc

    # ---- forward, stashing c_r / s_r / v_r (all small) ----
    b = jnp.zeros((in_caps, out_caps), jnp.float32)
    c_st, s_st, v_st = [], [], []
    for r in range(R):
        c = jax.nn.softmax(b, axis=1)
        s = weighted_rows(c)                       # [out_len, out]
        n2 = jnp.dot(ones_ol, s * s, preferred_element_type=jnp.float32)
        g = n2 / (1.0 + n2) * jax.lax.rsqrt(n2 + eps)
        v = s * jnp.broadcast_to(g, s.shape)
        c_st.append(c); s_st.append(s); v_st.append(v)
        if r < R - 1:
            b = b + col_sum(v)

    # ---- reverse ----
    dw_sc[:] = jnp.zeros_like(dw_sc)
    dx = jnp.zeros((in_caps, in_len), jnp.float32)
    dv = dv_ref[0].astype(jnp.float32)             # [out_len, out]
    db_next = jnp.zeros((in_caps, out_caps), jnp.float32)

    def pullback(rowf, colf):
        """du[o] = rowf (x) colf[o]: accumulate dx and dw contributions.
        rowf: [in, out], colf: [out_len, out]."""
        nonlocal dx
        m = jnp.zeros((in_len, out_caps), jnp.float32)
        for o in range(out_length):
            m = m + w_ref[o].astype(jnp.float32) * \
                jnp.broadcast_to(colf[o:o + 1], (in_len, out_caps))
        dx = dx + jax.lax.dot_general(
            rowf, m, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = jax.lax.dot_general(
            x, rowf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [in_len, out]
        for o in range(out_length):
            dw_sc[o] = dw_sc[o] + t * jnp.broadcast_to(
                colf[o:o + 1], (in_len, out_caps))

    for r in reversed(range(R)):
        c, s = c_st[r], s_st[r]
        n2 = jnp.dot(ones_ol, s * s, preferred_element_type=jnp.float32)
        inv1 = 1.0 / (1.0 + n2)
        rs = jax.lax.rsqrt(n2 + eps)
        g = n2 * inv1 * rs
        # d(g)/d(n2) = inv1*rs - n2*inv1^2*rs - 0.5*n2*inv1*rs^3
        gp = inv1 * rs - n2 * inv1 * inv1 * rs - 0.5 * n2 * inv1 * rs * rs * rs
        dots = jnp.dot(ones_ol, dv * s, preferred_element_type=jnp.float32)
        ds = dv * jnp.broadcast_to(g, s.shape) \
            + s * jnp.broadcast_to(2.0 * dots * gp, s.shape)
        dc = col_sum(ds)                           # [in, out]
        pullback(c, ds)
        row = jnp.sum(c * dc, axis=1, keepdims=True)
        db_total = c * (dc - jnp.broadcast_to(row, dc.shape)) + db_next
        if r > 0:
            db_next = db_total
            pullback(db_total, v_st[r - 1])
            dv = weighted_rows(db_total)           # [out_len, out]

    dx_ref[0] = dx
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw_ref[...] = dw_sc[...]

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[...] = dw_ref[...] + dw_sc[...]


def _backward(x, weight, dv, num_iterations, vmem_limit_bytes=None):
    """x [B,in,in_len], weight [out,out_len,in_len], dv [B,out,out_len]
    -> (dx, dweight)."""
    bsz, in_caps, in_length = x.shape
    out_caps, out_length, _ = weight.shape
    w_t = jnp.transpose(weight, (1, 2, 0)).astype(jnp.float32)
    dv_t = jnp.transpose(dv, (0, 2, 1)).astype(jnp.float32)

    extra = {}
    if vmem_limit_bytes is not None:
        extra['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    dx, dw_t = pl.pallas_call(
        functools.partial(_bwd_kernel, num_iterations=num_iterations,
                          out_length=out_length),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, in_caps, in_length), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_length, in_length, out_caps),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_length, out_caps), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, in_caps, in_length), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_length, in_length, out_caps),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, in_caps, in_length), jnp.float32),
            jax.ShapeDtypeStruct((out_length, in_length, out_caps),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((out_length, in_caps, out_caps), jnp.float32),
            pltpu.VMEM((out_length, in_length, out_caps), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * in_caps * in_length * out_caps * out_length
            + 18 * num_iterations * bsz * in_caps * out_caps * out_length,
            bytes_accessed=2 * x.size * 4 + 2 * weight.size * 4
            + bsz * out_caps * out_length * 4,
            transcendentals=num_iterations * bsz * in_caps * out_caps,
        ),
        **extra,
    )(x.astype(jnp.float32), w_t, dv_t)
    dweight = jnp.transpose(dw_t, (2, 0, 1))
    return dx, dweight


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def capsule_linear_pallas(x, weight, num_iterations: int = 3):
    return _forward(x, weight, num_iterations)


def _fwd(x, weight, num_iterations):
    return _forward(x, weight, num_iterations), (x, weight)


# Mosaic's default VMEM budget is 16MB, but the physical VMEM on this v5e
# is far larger (a 64MB vmem_limit_bytes compiles and runs fine —
# measured, tools/bench_capsule.py). Kernels whose resident set exceeds
# the default get an explicit raised limit; _VMEM_MAX bounds the raise at
# the 64MB that was actually measured to compile and run on the chip —
# shapes needing more fall back to XLA rather than request an untested
# Mosaic limit at runtime.
_VMEM_DEFAULT = 14 * 1024 * 1024
_VMEM_MAX = 64 * 1024 * 1024


def _padded_sizes(x_shape, w_shape):
    """(w_bytes, u_bytes, x_bytes, v_bytes) with TPU (8,128) tile padding
    applied. x/v are the per-grid-step input/output blocks the kernel also
    holds resident (small next to w/u at every in-repo shape, but a shape
    near the 64MB ceiling must budget them to keep the guard honest)."""
    _, in_caps, in_length = x_shape
    out_caps, out_length, _ = w_shape
    oc = out_caps + (-out_caps % 128)
    ic = in_caps + (-in_caps % 8)
    w_bytes = out_length * in_length * oc * 4
    u_bytes = out_length * ic * oc * 4
    x_bytes = ic * (in_length + (-in_length % 128)) * 4
    v_bytes = (out_length + (-out_length % 8)) * oc * 4
    return w_bytes, u_bytes, x_bytes, v_bytes


def _bwd(num_iterations, residuals, g):
    x, weight = residuals
    w_bytes, u_bytes, x_bytes, v_bytes = _padded_sizes(x.shape, weight.shape)
    # The fused backward's win is keeping the vote tensor out of HBM; its
    # cost is streaming the whole weight + grad accumulator through VMEM on
    # every sequential grid step. Measured on v5e (tools/bench_capsule.py):
    # flagship G head (u 6.3MB >> w 1MB) fused is 3.5x XLA, but the 201-way
    # D classifier head (u 0.26MB << w 8.4MB) fused is 2.7x SLOWER than
    # XLA. Fuse only where votes dominate the weight.
    # x/dx blocks and the dv block are also resident per grid step.
    need = (4 * w_bytes + 2 * u_bytes + 2 * x_bytes + v_bytes
            + 2 * 1024 * 1024)
    if u_bytes < w_bytes or need > _VMEM_MAX:
        return _bwd_xla(num_iterations, residuals, g)
    limit = None if need <= _VMEM_DEFAULT else need
    dx, dw = _backward(x.astype(jnp.float32), weight.astype(jnp.float32),
                       g.astype(jnp.float32), num_iterations,
                       vmem_limit_bytes=limit)
    return dx.astype(x.dtype), dw.astype(weight.dtype)


def _bwd_xla(num_iterations, residuals, g):
    """Reference backward: autodiff through the pure-JAX routing (used for
    parity tests of the fused backward kernel)."""
    from .capsule import compute_votes, dynamic_routing
    x, weight = residuals

    def ref(x_, w_):
        return dynamic_routing(compute_votes(x_, w_), num_iterations)

    _, vjp = jax.vjp(ref, x.astype(jnp.float32), weight.astype(jnp.float32))
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(weight.dtype)


capsule_linear_pallas.defvjp(_fwd, _bwd)
