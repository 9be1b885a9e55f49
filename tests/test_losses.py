"""Numeric tests for the loss layer against closed forms and torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.train.losses import bce, ce_loss, kl_loss, nll_loss

RNG = jax.random.PRNGKey(0)


def test_bce_matches_closed_form():
    p = jnp.array([0.9, 0.1, 0.5, 0.7])
    t = jnp.array([1.0, 0.0, 1.0, 0.0])
    expected = -np.mean([np.log(0.9), np.log(0.9), np.log(0.5), np.log(0.3)])
    np.testing.assert_allclose(float(bce(p, t)), expected, rtol=1e-5)


def test_bce_matches_torch():
    torch = pytest.importorskip('torch')
    p = np.random.RandomState(0).uniform(0.01, 0.99, (32,)).astype('float32')
    t = (np.random.RandomState(1).uniform(size=32) > 0.5).astype('float32')
    ref = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)).item()
    np.testing.assert_allclose(float(bce(jnp.array(p), jnp.array(t))), ref,
                               rtol=1e-5)


def test_bce_saturated_is_clamped_and_finite_grad():
    p = jnp.array([0.0, 1.0])
    t = jnp.array([1.0, 0.0])
    val = float(bce(p, t))
    assert np.isfinite(val) and val <= 100.0
    g = jax.grad(lambda x: bce(x, t))(p)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ce_loss_matches_reference_formula():
    """ce_loss(logq, p) = -sum(p*logq)/batch
    (cub_trainer_splitz_cap_ca.py:60-65)."""
    logits = jax.random.normal(RNG, (4, 10))
    logq = jax.nn.log_softmax(logits, axis=-1)
    p = jax.nn.one_hot(jnp.array([1, 2, 3, 4]), 10)
    expected = -float(jnp.sum(p * logq)) / 4
    np.testing.assert_allclose(float(ce_loss(logq, p)), expected, rtol=1e-6)


def test_ce_loss_one_hot_equals_nll():
    logits = jax.random.normal(RNG, (4, 10))
    logq = jax.nn.log_softmax(logits, axis=-1)
    targets = jnp.array([1, 2, 3, 4])
    p = jax.nn.one_hot(targets, 10)
    np.testing.assert_allclose(float(ce_loss(logq, p)),
                               float(nll_loss(logq, targets)), rtol=1e-6)


def test_kl_loss_closed_form():
    """KL = -0.5 mean(1 + logvar - mu^2 - e^logvar); standard normal -> 0."""
    mu = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(kl_loss(mu, logvar)) == 0.0
    mu = jnp.ones((2, 2))
    expected = -0.5 * (1 + 0 - 1 - 1)
    np.testing.assert_allclose(float(kl_loss(mu, jnp.zeros((2, 2)))),
                               expected, rtol=1e-6)


def test_kl_loss_matches_torch_formula():
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(0)
    mu = rs.randn(8, 16).astype('float32')
    logvar = rs.randn(8, 16).astype('float32')
    tmu, tlv = torch.tensor(mu), torch.tensor(logvar)
    kld = tmu.pow(2).add_(tlv.exp()).mul_(-1).add_(1).add_(tlv)
    ref = float(torch.mean(kld).mul_(-0.5))
    np.testing.assert_allclose(float(kl_loss(jnp.array(mu), jnp.array(logvar))),
                               ref, rtol=1e-5)
