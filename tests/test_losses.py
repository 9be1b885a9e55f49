"""Numeric tests for the loss layer against closed forms and torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.train.losses import (bce, ce_loss,
                                           color_consistency_loss,
                                           compute_mean_covariance, kl_loss,
                                           nll_loss)

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


def test_bce_saturated_matches_torch_exactly():
    """At full saturation torch's BCELoss clamps each log to -100, so a
    fully-wrong prediction contributes exactly 100 per element on BOTH
    sides — the regime GAN loss logs are read in (an earlier version
    bottomed the target-0/p->1 side out at ~16)."""
    torch = pytest.importorskip('torch')
    p = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    t = np.array([1.0, 0.0, 0.0, 1.0], np.float32)  # wrong, wrong, right x2
    ref = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(t)).item()
    ours = float(bce(jnp.array(p), jnp.array(t)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    assert ours == pytest.approx(50.0)  # (100 + 100 + 0 + 0) / 4


def test_bce_out_of_range_input_is_finite():
    """torch.nn.BCELoss raises on p outside [0, 1]; inside jit we can't
    raise data-dependently, so bce clamps instead of silently emitting
    NaN through log of a negative (p slightly > 1 makes 1-p < 0)."""
    p = jnp.array([1.0 + 1e-6, -1e-6, 1.5, -0.5])
    t = jnp.array([0.0, 1.0, 0.0, 1.0])
    val = float(bce(p, t))
    assert np.isfinite(val) and val == pytest.approx(100.0)
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


def test_compute_mean_covariance_matches_torch_reference():
    """Channel mean/cov vs a literal port of the reference helper
    (trainer.py:29-47; NCHW there, NHWC here)."""
    torch = pytest.importorskip('torch')
    rs = np.random.RandomState(0)
    img = rs.uniform(-1, 1, (4, 8, 8, 3)).astype('float32')
    t = torch.tensor(img).permute(0, 3, 1, 2)  # NCHW
    b, c, h, w = t.shape
    tmu = t.mean(2, keepdim=True).mean(3, keepdim=True)
    hat = (t - tmu.expand_as(t)).view(b, c, h * w)
    tcov = torch.bmm(hat, hat.transpose(1, 2)) / (h * w)
    mu, cov = compute_mean_covariance(jnp.array(img))
    np.testing.assert_allclose(np.asarray(mu), tmu.squeeze(-1).squeeze(-1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cov), tcov.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_color_consistency_loss_zero_on_identical_stats():
    """Same image at both stages -> zero loss; gradient flows only through
    the higher stage (the lower is stop_gradient'ed, StackGAN-v2 style)."""
    img = jax.random.uniform(RNG, (2, 8, 8, 3), minval=-1, maxval=1)
    val = float(color_consistency_loss([img, img], coeff=50.0))
    np.testing.assert_allclose(val, 0.0, atol=1e-5)
    other = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3),
                               minval=-1, maxval=1)
    assert float(color_consistency_loss([img, other], coeff=50.0)) > 0
    g_lo, g_hi = jax.grad(
        lambda lo, hi: color_consistency_loss([lo, hi], 50.0),
        argnums=(0, 1))(img, other)
    assert float(jnp.max(jnp.abs(g_lo))) == 0.0
    assert float(jnp.max(jnp.abs(g_hi))) > 0.0


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
