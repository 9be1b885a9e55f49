"""Tests for the auxiliary layer/loss library (nn/extras.py <- myutils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.nn.extras import (
    CondInstanceNorm, compute_gradient_penalty, dir_sampling,
    spectral_normalize)

RNG = jax.random.PRNGKey(0)


def test_spectral_normalize_unit_top_singular_value():
    w = jax.random.normal(RNG, (16, 8)) * 3.0
    u = jax.random.normal(jax.random.PRNGKey(1), (16,))
    w_sn, u = w, u
    for _ in range(50):  # power iteration converges
        w_sn, u = spectral_normalize(w, u)
    s = np.linalg.svd(np.asarray(w_sn), compute_uv=False)
    np.testing.assert_allclose(s[0], 1.0, rtol=1e-3)


def test_cond_instance_norm_per_class_affine():
    m = CondInstanceNorm(num_features=4, num_classes=3)
    x = jax.random.normal(RNG, (2, 8, 8, 4)) * 5 + 2
    labels = jnp.array([0, 2])
    vs = m.init({'params': RNG}, x, labels)
    out = m.apply(vs, x, labels)
    assert out.shape == x.shape
    # with default gamma=1, beta=0 the output is instance-normalized
    mu = np.asarray(out).mean(axis=(1, 2))
    np.testing.assert_allclose(mu, 0.0, atol=1e-4)


def test_dir_sampling_concentrates_on_label():
    labels = jnp.array([1, 3, 1, 0])
    soft = dir_sampling(RNG, labels, num_classes=5, alpha_on=100.0,
                        alpha_off=0.1)
    assert soft.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(soft).sum(-1), 1.0, rtol=1e-5)
    assert np.all(np.asarray(soft)[np.arange(4), np.asarray(labels)] > 0.5)


def test_gradient_penalty_zero_for_unit_gradient():
    """For D(x) = sum over a single channel, grad norm is sqrt(n); pick a
    linear D with known gradient to sanity-check the formula."""
    real = jax.random.normal(RNG, (4, 2, 2, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 1))

    # D(x) = 0.5 * sum(x): grad = 0.5 everywhere -> norm = 0.5*sqrt(4) = 1
    def d_apply(x):
        return 0.5 * jnp.sum(x.reshape(x.shape[0], -1), axis=1)

    gp = compute_gradient_penalty(jax.random.PRNGKey(2), d_apply, real, fake)
    np.testing.assert_allclose(float(gp), 0.0, atol=1e-6)


def test_gradient_penalty_positive_otherwise():
    real = jax.random.normal(RNG, (4, 2, 2, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 1))

    def d_apply(x):
        return jnp.sum(jnp.square(x.reshape(x.shape[0], -1)), axis=1)

    gp = compute_gradient_penalty(jax.random.PRNGKey(2), d_apply, real, fake)
    assert float(gp) > 0
