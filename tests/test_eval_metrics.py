"""IS / FID math tests (closed-form + degenerate cases)."""

import numpy as np
import pytest

from text2img_ekl_tpu.eval import (
    calculate_activation_statistics, calculate_frechet_distance,
    compute_inception_score, negative_log_posterior_probability)


def test_is_uniform_predictions_score_one():
    """If every sample has the same marginal-equal distribution, KL is 0 and
    IS = 1."""
    preds = np.full((100, 10), 0.1)
    mean, std = compute_inception_score(preds, 1)
    np.testing.assert_allclose(mean, 1.0, rtol=1e-6)


def test_is_confident_diverse_predictions_high():
    """One-hot predictions uniformly covering k classes give IS = k."""
    k = 10
    preds = np.eye(k)[np.arange(200) % k] * 0.999 + 1e-4
    preds /= preds.sum(1, keepdims=True)
    mean, _ = compute_inception_score(preds, 1)
    assert mean > 8.0  # close to k


def test_is_collapsed_predictions_low():
    preds = np.zeros((100, 10)) + 1e-6
    preds[:, 3] = 1.0
    preds /= preds.sum(1, keepdims=True)
    mean, _ = compute_inception_score(preds, 1)
    assert mean < 1.1


def test_is_matches_reference_formula():
    """Port parity with compute_inception_score
    (cub_trainer_splitz_cap_ca.py:87-98)."""
    rs = np.random.RandomState(0)
    preds = rs.dirichlet(np.ones(10), size=64)
    mean, std = compute_inception_score(preds, 4)
    # manual
    scores = []
    for i in range(4):
        part = preds[i * 16:(i + 1) * 16]
        kl = part * (np.log(part) - np.log(np.mean(part, 0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    np.testing.assert_allclose(mean, np.mean(scores), rtol=1e-8)
    np.testing.assert_allclose(std, np.std(scores), rtol=1e-8)


def test_nlpp():
    preds = np.full((10, 4), 0.25)
    mean, std = negative_log_posterior_probability(preds, 1)
    np.testing.assert_allclose(mean, -np.log(0.25), rtol=1e-6)


def test_fid_identical_distributions_zero():
    rs = np.random.RandomState(0)
    act = rs.randn(500, 16)
    mu, sigma = calculate_activation_statistics(act)
    fid = calculate_frechet_distance(mu, sigma, mu, sigma)
    assert abs(fid) < 1e-4


def test_fid_mean_shift():
    """For equal covariance, FID == ||mu1 - mu2||^2."""
    rs = np.random.RandomState(0)
    act = rs.randn(2000, 8)
    mu, sigma = calculate_activation_statistics(act)
    shift = np.ones(8) * 2.0
    fid = calculate_frechet_distance(mu, sigma, mu + shift, sigma)
    np.testing.assert_allclose(fid, np.sum(shift ** 2), rtol=1e-3)


def test_fid_singular_covariance_jitter():
    """Rank-deficient covariance goes through the eps-jitter path
    (fid.py:128-136) without raising."""
    mu = np.zeros(4)
    sigma = np.zeros((4, 4))  # singular
    fid = calculate_frechet_distance(mu, sigma, mu + 1.0, sigma)
    assert np.isfinite(fid)


def test_activation_statistics_shapes():
    act = np.random.RandomState(0).randn(32, 2048)
    mu, sigma = calculate_activation_statistics(act)
    assert mu.shape == (2048,)
    assert sigma.shape == (2048, 2048)
