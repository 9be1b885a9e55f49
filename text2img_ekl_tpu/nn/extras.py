"""Auxiliary layer/loss library (reference: myutils.py).

JAX equivalents of the reference's unused-by-main-path utility library
(myutils.py:12-183): spectral normalization (power iteration), conditional
instance norm, Dirichlet label-noise sampling, WGAN-GP gradient penalties,
and the directory-to-array cache helper.
"""

from __future__ import annotations

import os
import pickle
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def imgs2ndarray(folder: str, cache: Optional[str] = None,
                 size: Optional[int] = None) -> list:
    """Directory -> list of HWC uint8 arrays with a pickle cache
    (myutils.py:12-25)."""
    from PIL import Image

    # size participates in the cache key: a full-size cache must not be
    # served to a later size=64 call (silently wrong-resolution arrays)
    suffix = '.ndarray%s.pkl' % ('_%d' % size if size else '')
    cache = cache or (folder.rstrip('/') + suffix)
    if os.path.isfile(cache):
        with open(cache, 'rb') as f:
            return pickle.load(f)
    out = []
    for root, _, files in sorted(os.walk(folder)):
        for name in sorted(files):
            if name.lower().endswith(('.png', '.jpg', '.jpeg')):
                img = Image.open(os.path.join(root, name)).convert('RGB')
                if size:
                    img = img.resize((size, size), Image.BILINEAR)
                out.append(np.asarray(img, np.uint8))
    with open(cache, 'wb') as f:
        pickle.dump(out, f)
    return out


def spectral_normalize(w: jnp.ndarray, u: jnp.ndarray,
                       n_iterations: int = 1, eps: float = 1e-12):
    """One step of power-iteration spectral normalization
    (myutils.py:28-65).

    w: [out, in...] matricized over the leading axis. Returns (w / sigma,
    new_u). State (u) is threaded explicitly — TPU-functional style instead
    of the reference's in-module buffers.
    """
    w_mat = w.reshape(w.shape[0], -1)
    v = None
    for _ in range(n_iterations):
        v = w_mat.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w_mat @ v
        u = u / (jnp.linalg.norm(u) + eps)
    sigma = u @ w_mat @ v
    return w / sigma, jax.lax.stop_gradient(u)


class SpectralNormDense(nn.Module):
    """Dense layer with spectral normalization; the power-iteration vector
    lives in the 'spectral' variable collection."""

    features: int
    n_power_iterations: int = 1

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        w = self.param('kernel', jax.nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        u = self.variable('spectral', 'u',
                          lambda: jax.random.normal(
                              self.make_rng('params') if self.is_initializing()
                              else jax.random.PRNGKey(0), (self.features,)))
        w_sn, new_u = spectral_normalize(w.T, u.value,
                                         self.n_power_iterations)
        if update_stats and not self.is_initializing():
            u.value = new_u
        return x @ w_sn.T


class CondInstanceNorm(nn.Module):
    """Conditional instance norm: per-class scale/shift over
    instance-normalized features (myutils.py:68-138). NHWC."""

    num_features: int
    num_classes: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, labels):
        # the reference draws gamma ~ U[0,1) (myutils.py:85-86
        # self.weight.data.uniform_()), NOT ones — a fresh build must
        # start from the same function distribution
        gamma = self.param('gamma', jax.nn.initializers.uniform(scale=1.0),
                           (self.num_classes, self.num_features))
        beta = self.param('beta', jax.nn.initializers.zeros,
                          (self.num_classes, self.num_features))
        axes = tuple(range(1, x.ndim - 1))  # spatial axes
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + self.eps)
        g = gamma[labels].reshape((x.shape[0],) + (1,) * (x.ndim - 2)
                                  + (self.num_features,))
        b = beta[labels].reshape(g.shape)
        return xn * g + b


def dir_sampling(key, labels: jnp.ndarray, num_classes: int,
                 alpha_on: float = 10.0, alpha_off: float = 1.0):
    """Dirichlet label-noise sampling (myutils.py:141-151): draw a soft
    label vector concentrated on the true class."""
    alphas = jnp.full((labels.shape[0], num_classes), alpha_off)
    alphas = alphas.at[jnp.arange(labels.shape[0]), labels].set(alpha_on)
    return jax.random.dirichlet(key, alphas)


def compute_gradient_penalty(key, d_apply: Callable, real: jnp.ndarray,
                             fake: jnp.ndarray) -> jnp.ndarray:
    """WGAN-GP penalty (myutils.py:154-167): E[(||grad_x D(x_hat)|| - 1)^2]
    at random interpolates."""
    b = real.shape[0]
    alpha = jax.random.uniform(key, (b,) + (1,) * (real.ndim - 1))
    x_hat = alpha * real + (1 - alpha) * fake

    def d_scalar(x):
        return jnp.sum(d_apply(x))

    grads = jax.grad(d_scalar)(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(grads.reshape(b, -1)), axis=1)
                     + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def compute_gradient_penalty_withcond(key, d_apply: Callable,
                                      real: jnp.ndarray, fake: jnp.ndarray,
                                      cond: jnp.ndarray) -> jnp.ndarray:
    """Conditional variant (myutils.py:170-183)."""
    return compute_gradient_penalty(
        key, lambda x: d_apply(x, cond), real, fake)
