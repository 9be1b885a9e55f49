"""Capsule linear layer with routing, TPU-native.

The reference depends on the external pip package ``capsule_layer`` whose
CapsuleLinear forward runs fused CUDA kernels (imported at model.py:12 and
used at model.py:248, 290, 301, 943, 1082). This module provides the
TPU-native equivalent:

  * a pure-JAX implementation (this file) — the semantic reference, fully
    differentiable, used for parity tests and as the autodiff backward;
  * a fused Pallas TPU kernel (``capsule_pallas.py``) for the forward pass,
    keeping the vote tensor in VMEM across routing iterations instead of
    round-tripping it through HBM.

Semantics follow the upstream package's documented behaviour (the package
source is not vendored in the reference): with ``share_weight=True`` a weight
of shape [out_capsules, out_length, in_length] is shared across input
capsules; votes are u[b,i,j,:] = W[j] @ x[b,i,:]; routing-by-agreement
("dynamic", Sabour et al. 2017) iterates softmax coupling over output
capsules, weighted vote aggregation, squash, and agreement updates. A
"k_means" cosine-similarity routing variant is also provided.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@functools.lru_cache(maxsize=1)
def _tpu_backend() -> bool:
    """True when the default backend is a TPU (incl. the 'axon' tunnel)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return ('tpu' in dev.platform.lower()
            or 'tpu' in getattr(dev, 'device_kind', '').lower())


def squash(s: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """v = (|s|^2 / (1 + |s|^2)) * s / |s| along ``axis``."""
    s2 = jnp.sum(jnp.square(s), axis=axis, keepdims=True)
    scale = s2 / (1.0 + s2) * jax.lax.rsqrt(s2 + eps)
    return s * scale


def compute_votes(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Vote tensor u[b, i, j, o].

    x: [B, in_capsules, in_length]
    weight: [out_capsules, out_length, in_length] (shared) or
            [out_capsules, in_capsules, out_length, in_length] (unshared)
    returns [B, in_capsules, out_capsules, out_length]
    """
    if weight.ndim == 3:
        return jnp.einsum('bil,jol->bijo', x, weight,
                          preferred_element_type=jnp.float32)
    return jnp.einsum('bil,jiol->bijo', x, weight,
                      preferred_element_type=jnp.float32)


def dynamic_routing(u: jnp.ndarray, num_iterations: int = 3) -> jnp.ndarray:
    """Routing by agreement over votes u [B, in, out, out_length].

    Coupling softmax is over the *output* capsule axis. The loop is unrolled
    (num_iterations is small and static) so XLA fuses each iteration.
    """
    b = jnp.zeros(u.shape[:3], dtype=jnp.float32)  # [B, in, out]
    v = None
    for r in range(num_iterations):
        c = jax.nn.softmax(b, axis=2)
        s = jnp.einsum('bij,bijo->bjo', c, u,
                       preferred_element_type=jnp.float32)
        v = squash(s, axis=-1)
        if r < num_iterations - 1:
            b = b + jnp.einsum('bijo,bjo->bij', u, v,
                               preferred_element_type=jnp.float32)
    return v


def k_means_routing(u: jnp.ndarray, num_iterations: int = 3,
                    eps: float = 1e-8) -> jnp.ndarray:
    """Cosine-similarity (k-means style) routing over votes.

    Initial centroid is the mean vote; couplings are softmaxed cosine
    similarities between votes and centroids.
    """
    v = jnp.mean(u, axis=1)  # [B, out, out_length]
    for _ in range(num_iterations):
        u_n = u * jax.lax.rsqrt(
            jnp.sum(jnp.square(u), axis=-1, keepdims=True) + eps)
        v_n = v * jax.lax.rsqrt(
            jnp.sum(jnp.square(v), axis=-1, keepdims=True) + eps)
        sim = jnp.einsum('bijo,bjo->bij', u_n, v_n,
                         preferred_element_type=jnp.float32)
        c = jax.nn.softmax(sim, axis=2)
        v = jnp.einsum('bij,bijo->bjo', c, u,
                       preferred_element_type=jnp.float32)
    return squash(v, axis=-1)


def capsule_linear(x: jnp.ndarray, weight: jnp.ndarray,
                   num_iterations: int = 3, routing: str = 'dynamic',
                   use_pallas: bool = False) -> jnp.ndarray:
    """Full capsule-linear op: votes + routing.

    x: [B, in_capsules, in_length]  ->  [B, out_capsules, out_length]
    """
    x = x.astype(jnp.float32)
    weight = weight.astype(jnp.float32)
    if (use_pallas and routing == 'dynamic' and weight.ndim == 3
            and _tpu_backend()):
        from .capsule_pallas import capsule_linear_pallas
        return capsule_linear_pallas(x, weight, num_iterations)
    u = compute_votes(x, weight)
    if routing == 'dynamic':
        return dynamic_routing(u, num_iterations)
    elif routing == 'k_means':
        return k_means_routing(u, num_iterations)
    raise ValueError('unknown routing type: %s' % routing)


class CapsuleLinear(nn.Module):
    """Flax module mirroring capsule_layer.modules.CapsuleLinear.

    out_capsules/in_length/out_length as in the upstream API; in_capsules may
    be None (shared weight across input capsules, the mode every reference
    call site uses).
    """

    out_capsules: int
    in_length: int
    out_length: int
    in_capsules: Optional[int] = None
    share_weight: bool = True
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 3 and x.shape[-1] == self.in_length, x.shape
        if self.share_weight or self.in_capsules is None:
            shape = (self.out_capsules, self.out_length, self.in_length)
        else:
            shape = (self.out_capsules, self.in_capsules,
                     self.out_length, self.in_length)
        # The reference's weights_init matches any classname containing
        # 'Linear' — including CapsuleLinear — and applies orthogonal init
        # over the [out_capsules, flattened-rest] matricization
        # (cub_trainer_splitz_cap_ca.py:74-77).
        w = self.param('weight',
                       jax.nn.initializers.orthogonal(scale=1.0, column_axis=0),
                       shape, jnp.float32)
        # 'conv' remat anchor (TPU_REMAT_G='conv', nn/blocks.py): save the
        # routed output so the backward never re-runs the routing loop.
        from jax.ad_checkpoint import checkpoint_name
        return checkpoint_name(
            capsule_linear(x, w, self.num_iterations, self.routing,
                           self.use_pallas), 'conv')
