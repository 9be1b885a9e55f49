"""Variational conditioning networks.

CANet re-designs the reference CA_NET (model.py:126-157): an FC 1024 -> 4*ef
followed by GLU, split into (mu, logvar), reparameterized with Gaussian noise.

VCNet re-designs the reference VC_NET (model.py:160-201): an MLP over
concat(noise, cond) with BatchNorm'd hidden layers producing (mu, logvar);
at test time with ``truncation_threshold > 0`` the reparameterization seed is
drawn from a truncated normal (model.py:194-197 uses scipy truncnorm; here we
use jax.random.truncated_normal on device).

Reparameterization noise comes from the 'reparam' flax RNG stream.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Dense, glu

Dtype = Any


class CANet(nn.Module):
    """Conditioning augmentation over the sentence embedding."""

    ef_dim: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, text_embedding, train: bool = True):
        x = Dense(self.ef_dim * 4, use_bias=True, dtype=self.dtype)(text_embedding)
        x = glu(x).astype(jnp.float32)
        mu = x[:, :self.ef_dim]
        logvar = x[:, self.ef_dim:]
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng('reparam'), std.shape, jnp.float32)
        c_code = eps * std + mu
        return c_code, mu, logvar, std


class VCNet(nn.Module):
    """Variational conditional-manifold encoder over concat(noise, cond)."""

    manifd_dim: int = 128
    truncation_threshold: float = -1.0  # >0 enables truncated sampling at eval
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, noise, cond, train: bool = True):
        x = jnp.concatenate(
            [noise.astype(self.dtype), cond.astype(self.dtype)], axis=1)
        h = Dense(512, dtype=self.dtype)(x)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h).astype(self.dtype)
        h = Dense(256, dtype=self.dtype)(h)
        h = BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h).astype(self.dtype)
        mu = Dense(self.manifd_dim, dtype=self.dtype)(h).astype(jnp.float32)
        logvar = Dense(self.manifd_dim, dtype=self.dtype)(h).astype(jnp.float32)

        std = jnp.exp(0.5 * logvar)
        key = self.make_rng('reparam')
        if (not train) and self.truncation_threshold > 0:
            t = float(self.truncation_threshold)
            seed = jax.random.truncated_normal(key, -t, t, std.shape, jnp.float32)
        else:
            seed = jax.random.normal(key, std.shape, jnp.float32)
        c = seed * std + mu
        return c, mu, logvar, std
