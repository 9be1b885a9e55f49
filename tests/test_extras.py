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


def test_imgs2ndarray_cache_roundtrip(tmp_path):
    """Directory -> uint8 arrays with a pickle cache (myutils.py:12-25):
    second call must hit the cache, size= resizes."""
    from PIL import Image
    from text2img_ekl_tpu.nn.extras import imgs2ndarray
    d = tmp_path / 'imgs'
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (20, 24, 3),
                                     dtype=np.uint8)).save(d / f'{i}.png')
    out = imgs2ndarray(str(d), size=16)
    assert len(out) == 3 and out[0].shape == (16, 16, 3)
    # size participates in the cache key: a full-size cache must never
    # be served to a size=16 call and vice versa
    assert (tmp_path / 'imgs.ndarray_16.pkl').is_file()
    (d / '0.png').unlink()  # cache must mask the deletion
    again = imgs2ndarray(str(d), size=16)
    assert len(again) == 3
    np.testing.assert_array_equal(out[0], again[0])
    # ...but a different size is a different cache entry, re-scanned
    full = imgs2ndarray(str(d))
    assert len(full) == 2 and full[0].shape == (20, 24, 3)
    assert (tmp_path / 'imgs.ndarray.pkl').is_file()


def test_spectral_norm_dense_bounds_singular_value():
    """SpectralNormDense: after a few power-iteration updates the
    effective weight has top singular value ~1, so outputs are
    norm-bounded (myutils.py:28-65 semantics)."""
    import jax
    import jax.numpy as jnp
    from text2img_ekl_tpu.nn.extras import SpectralNormDense
    layer = SpectralNormDense(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6))
    vs = layer.init({'params': jax.random.PRNGKey(1)}, x)
    # scale the kernel so the raw singular value is far from 1
    vs = {'params': {'kernel': vs['params']['kernel'] * 7.0},
          'spectral': vs['spectral']}
    sp = vs['spectral']
    for _ in range(20):
        _, mut = layer.apply({'params': vs['params'], 'spectral': sp}, x,
                             mutable=['spectral'])
        sp = mut['spectral']
    # forward with update_stats=False must not mutate u
    layer.apply({'params': vs['params'], 'spectral': sp}, x,
                update_stats=False)
    w = np.asarray(vs['params']['kernel'])
    u = np.asarray(sp['u'])
    # direct check: top singular value of the normalized matrix ~ 1
    w_mat = w.T
    for _ in range(50):
        v = w_mat.T @ u; v /= np.linalg.norm(v) + 1e-12
        u = w_mat @ v; u /= np.linalg.norm(u) + 1e-12
    sigma = u @ w_mat @ v
    np.testing.assert_allclose(
        np.linalg.svd(w_mat / sigma, compute_uv=False)[0], 1.0, rtol=1e-2)


def test_gradient_penalty_withcond_matches_uncond_when_cond_ignored():
    import jax
    import jax.numpy as jnp
    from text2img_ekl_tpu.nn.extras import (
        compute_gradient_penalty, compute_gradient_penalty_withcond)
    key = jax.random.PRNGKey(0)
    real = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    fake = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
    cond = jax.random.normal(jax.random.PRNGKey(3), (4, 5))
    d_unc = lambda x: jnp.sum(x ** 2, axis=1)
    d_cond = lambda x, c: jnp.sum(x ** 2, axis=1) + 0.0 * jnp.sum(c)
    gp1 = compute_gradient_penalty(key, d_unc, real, fake)
    gp2 = compute_gradient_penalty_withcond(key, d_cond, real, fake, cond)
    np.testing.assert_allclose(float(gp1), float(gp2), rtol=1e-6)
