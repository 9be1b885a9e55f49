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


def test_fid_scorer_end_to_end():
    """FIDScorer with random tower weights: activation shapes, FID of a
    set against itself ~ 0, and .npz-stats comparison (fid.py:208-219)."""
    import jax
    from text2img_ekl_tpu.eval.fid import FIDScorer
    from text2img_ekl_tpu.models.inception_v3 import make_inception

    model = make_inception(1000, 'slim')
    variables = jax.jit(model.init)({'params': jax.random.PRNGKey(0)},
                                    np.zeros((1, 299, 299, 3), np.float32))
    scorer = FIDScorer(variables, batch_size=2)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    act = scorer.activations_uint8(imgs)
    assert act.shape == (3, 2048)
    assert np.all(np.isfinite(act))
    # gan-range path on the equivalent [-1, 1] images gives the same
    # activations (preprocessing parity)
    act2 = scorer.activations_gan(imgs.astype(np.float32) / 127.5 - 1.0)
    np.testing.assert_allclose(act, act2, rtol=2e-2, atol=2e-3)
    # identical sets -> FID 0 (rank-deficient cov exercises the sqrtm
    # jitter path)
    imgs6 = np.concatenate([imgs, imgs]) 
    assert scorer.fid_between(imgs6, imgs6) < 1e-3


def test_fid_scorer_against_npz_stats(tmp_path):
    import jax
    from text2img_ekl_tpu.eval.fid import (
        FIDScorer, calculate_activation_statistics)
    from text2img_ekl_tpu.models.inception_v3 import make_inception

    model = make_inception(1000, 'slim')
    variables = jax.jit(model.init)({'params': jax.random.PRNGKey(0)},
                                    np.zeros((1, 299, 299, 3), np.float32))
    scorer = FIDScorer(variables, batch_size=4)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    mu, sigma = calculate_activation_statistics(
        scorer.activations_uint8(imgs))
    np.savez(tmp_path / 'stats.npz', mu=mu, sigma=sigma)
    fid = scorer.fid_against_stats(imgs, str(tmp_path / 'stats.npz'))
    assert fid < 1e-3
