"""Experimental batch-blocked capsule forward kernels (bench-only).

Two candidate redesigns of ops/capsule_pallas._forward, benchmarked on real
TPU before promoting a winner:

  A. stored-u blocked: same layout as the shipped kernel but NB samples per
     grid step (votes scratch [out_len, NB*in, out]); per-sample reductions
     via block-ones matmuls.
  B. recompute-votes blocked: never materialize the full vote tensor —
     recompute u[o] = x @ w[o] on the fly inside every routing pass (the
     vote matmul is K=in_length≈8, nearly free on the MXU), so VMEM holds
     only couplings/outputs and NB can be large.

Layout rules (Mosaic): no in-kernel reshape that merges a leading dim into
sublanes, no transpose that moves a tiled dim — x is pre-flattened to
[B*in, in_len] outside, and the output is written o-major [out_len, B, out]
with the batch transpose done by XLA outside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_ones(nb: int, in_caps: int) -> jnp.ndarray:
    """E [NB, NB*in]: E[s, s*in + i] = 1 — per-sample row-sum matmul."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb * in_caps), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb * in_caps), 0)
    return (cols // in_caps == rows).astype(jnp.float32)


def _block_ones_t(nb: int, in_caps: int) -> jnp.ndarray:
    """E.T built directly (in-kernel transpose is a relayout)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb * in_caps, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb * in_caps, nb), 1)
    return (rows // in_caps == cols).astype(jnp.float32)


# ---------------------------------------------------------------- variant A
def _kernel_stored(x_ref, w_ref, v_ref, u_sc, s_sc, b_sc, *, iters, out_len,
                   nb, in_caps):
    x = x_ref[...].astype(jnp.float32)             # [NB*in, in_len]
    out_caps = u_sc.shape[2]
    E = _block_ones(nb, in_caps)
    ET = _block_ones_t(nb, in_caps)

    def vote_body(o, _):
        u_sc[o] = jnp.dot(x, w_ref[o].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, out_len, vote_body, 0)
    b_sc[...] = jnp.zeros((nb * in_caps, out_caps), jnp.float32)
    for r in range(iters):
        c = jax.nn.softmax(b_sc[...], axis=1)

        def s_body(o, _):
            s_sc[o] = jnp.dot(E, u_sc[o] * c,
                              preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, out_len, s_body, 0)
        s = s_sc[...]                               # [out_len, NB, out]
        n2 = jnp.sum(s * s, axis=0)                 # [NB, out]
        scale = n2 / (1.0 + n2) * jax.lax.rsqrt(n2 + 1e-8)
        if r < iters - 1:
            s_sc[...] = s * scale[None]

            def b_body(o, _):
                vb = jnp.dot(ET, s_sc[o], preferred_element_type=jnp.float32)
                b_sc[...] += u_sc[o] * vb
                return 0

            jax.lax.fori_loop(0, out_len, b_body, 0)
        else:
            v_ref[...] = s * scale[None]


def forward_stored(x, weight, num_iterations=3, nb=2, vmem_mb=None):
    bsz, in_caps, in_len = x.shape
    out_caps, out_len, _ = weight.shape
    pad = -bsz % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = bsz + pad
    x2 = x.reshape(bp * in_caps, in_len).astype(jnp.float32)
    w_t = jnp.transpose(weight, (1, 2, 0)).astype(jnp.float32)
    params = {}
    if vmem_mb:
        params['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    v = pl.pallas_call(
        functools.partial(_kernel_stored, iters=num_iterations,
                          out_len=out_len, nb=nb, in_caps=in_caps),
        grid=(bp // nb,),
        in_specs=[
            pl.BlockSpec((nb * in_caps, in_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_len, in_len, out_caps), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_len, nb, out_caps), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_len, bp, out_caps), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((out_len, nb * in_caps, out_caps), jnp.float32),
            pltpu.VMEM((out_len, nb, out_caps), jnp.float32),
            pltpu.VMEM((nb * in_caps, out_caps), jnp.float32),
        ],
        **params,
    )(x2, w_t)
    return jnp.transpose(v[:, :bsz, :], (1, 2, 0))   # [B, out, out_len]


# ---------------------------------------------------------------- variant C
def _kernel_seq(x_ref, w_ref, v_ref, u_sc, *, iters, out_len, nb, in_caps):
    """NB samples per grid step, routed sequentially with the shipped
    per-sample algorithm (u buffer reused) — pure grid/DMA amortization."""
    for s_i in range(nb):
        x = x_ref[s_i * in_caps:(s_i + 1) * in_caps].astype(jnp.float32)
        for o in range(out_len):
            u_sc[o] = jnp.dot(x, w_ref[o].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        u = u_sc[:]
        in_n, out_caps = u.shape[1], u.shape[2]
        b = jnp.zeros((in_n, out_caps), jnp.float32)
        ones = jnp.ones((1, out_len), jnp.float32)
        for r in range(iters):
            c = jax.nn.softmax(b, axis=1)
            s = jnp.sum(u * c[None, :, :], axis=1)
            s2 = jnp.dot(ones, s * s, preferred_element_type=jnp.float32)
            scale = s2 / (1.0 + s2) * jax.lax.rsqrt(s2 + 1e-8)
            v = s * jnp.broadcast_to(scale, s.shape)
            if r < iters - 1:
                b = b + jnp.sum(u * v[:, None, :], axis=0)
        v_ref[s_i] = v


def forward_seq(x, weight, num_iterations=3, nb=2, vmem_mb=None):
    bsz, in_caps, in_len = x.shape
    out_caps, out_len, _ = weight.shape
    pad = -bsz % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = bsz + pad
    x2 = x.reshape(bp * in_caps, in_len).astype(jnp.float32)
    w_t = jnp.transpose(weight, (1, 2, 0)).astype(jnp.float32)
    params = {}
    if vmem_mb:
        params['compiler_params'] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)
    v = pl.pallas_call(
        functools.partial(_kernel_seq, iters=num_iterations,
                          out_len=out_len, nb=nb, in_caps=in_caps),
        grid=(bp // nb,),
        in_specs=[
            pl.BlockSpec((nb * in_caps, in_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_len, in_len, out_caps), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, out_len, out_caps), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, out_len, out_caps), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((out_len, in_caps, out_caps), jnp.float32),
        ],
        **params,
    )(x2, w_t)
    return jnp.transpose(v[:bsz], (0, 2, 1))


# ---------------------------------------------------------------- variant B
def _kernel_recompute(x_ref, w_ref, v_ref, s_sc, b_sc, *, iters, out_len,
                      nb, in_caps):
    """Never materializes the [out_len, NB*in, out] vote tensor: u[o] is
    recomputed from x (K=in_len matmul) in every pass. Unrolling 32 M=384
    matmuls crashes the Mosaic backend, so the o-axis runs as fori_loop
    with scratch refs."""
    x = x_ref[...].astype(jnp.float32)             # [NB*in, in_len]
    out_caps = w_ref.shape[2]
    E = _block_ones(nb, in_caps)
    ET = _block_ones_t(nb, in_caps)
    b_sc[...] = jnp.zeros((nb * in_caps, out_caps), jnp.float32)

    for r in range(iters):
        c = jax.nn.softmax(b_sc[...], axis=1)

        def s_body(o, _):
            u_o = jnp.dot(x, w_ref[o].astype(jnp.float32),
                          preferred_element_type=jnp.float32)
            s_sc[o] = jnp.dot(E, u_o * c, preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, out_len, s_body, 0)
        s = s_sc[...]                               # [out_len, NB, out]
        n2 = jnp.sum(s * s, axis=0)                 # [NB, out]
        scale = n2 / (1.0 + n2) * jax.lax.rsqrt(n2 + 1e-8)
        if r < iters - 1:
            s_sc[...] = s * scale[None]             # v, for the b update

            def b_body(o, _):
                u_o = jnp.dot(x, w_ref[o].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
                vb = jnp.dot(ET, s_sc[o], preferred_element_type=jnp.float32)
                b_sc[...] += u_o * vb
                return 0

            jax.lax.fori_loop(0, out_len, b_body, 0)
        else:
            v_ref[...] = s * scale[None]


def forward_recompute(x, weight, num_iterations=3, nb=8):
    bsz, in_caps, in_len = x.shape
    out_caps, out_len, _ = weight.shape
    pad = -bsz % nb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    bp = bsz + pad
    x2 = x.reshape(bp * in_caps, in_len).astype(jnp.float32)
    w_t = jnp.transpose(weight, (1, 2, 0)).astype(jnp.float32)
    v = pl.pallas_call(
        functools.partial(_kernel_recompute, iters=num_iterations,
                          out_len=out_len, nb=nb, in_caps=in_caps),
        grid=(bp // nb,),
        in_specs=[
            pl.BlockSpec((nb * in_caps, in_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_len, in_len, out_caps), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_len, nb, out_caps), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_len, bp, out_caps), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((out_len, nb, out_caps), jnp.float32),
            pltpu.VMEM((nb * in_caps, out_caps), jnp.float32),
        ],
    )(x2, w_t)
    return jnp.transpose(v[:, :bsz, :], (1, 2, 0))   # [B, out, out_len]
