"""Capsule linear / routing tests (semantics + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.ops.capsule import (
    CapsuleLinear, capsule_linear, compute_votes, dynamic_routing,
    k_means_routing, squash)

RNG = jax.random.PRNGKey(0)


def test_squash_norm_below_one():
    s = jax.random.normal(RNG, (4, 8, 16)) * 10
    v = squash(s)
    norms = np.linalg.norm(np.asarray(v), axis=-1)
    assert np.all(norms < 1.0)
    # direction preserved
    cos = np.sum(np.asarray(s) * np.asarray(v), axis=-1)
    assert np.all(cos > 0)


def test_squash_small_vector_scales_quadratically():
    s = jnp.ones((1, 1, 2)) * 1e-3
    v = squash(s)
    # |v| ~ |s|^2 / (1+|s|^2) ~ |s|^2 for small s
    assert float(jnp.linalg.norm(v)) < 1e-5


def test_votes_shared_weight_shapes():
    x = jax.random.normal(RNG, (2, 6, 8))
    w = jax.random.normal(RNG, (10, 4, 8))
    # force f32 matmuls: under T2I_TEST_TPU=1 the MXU default is bf16,
    # which fails a 1e-5 comparison against the numpy reference
    with jax.default_matmul_precision('highest'):
        u = compute_votes(x, w)
    assert u.shape == (2, 6, 10, 4)
    # matches per-capsule matmul: u[b,i,j] = W[j] @ x[b,i]
    np.testing.assert_allclose(
        np.asarray(u[0, 0, 3]), np.asarray(w[3]) @ np.asarray(x[0, 0]),
        rtol=1e-5)


def test_votes_unshared_weight():
    x = jax.random.normal(RNG, (2, 6, 8))
    w = jax.random.normal(RNG, (10, 6, 4, 8))
    u = compute_votes(x, w)
    assert u.shape == (2, 6, 10, 4)


def test_dynamic_routing_uniform_first_iteration():
    """With one routing iteration, couplings are uniform: output is the
    squash of the mean vote scaled by in_capsules * 1/out ... i.e. softmax of
    zeros over out capsules = 1/out each."""
    x = jax.random.normal(RNG, (2, 6, 8))
    w = jax.random.normal(RNG, (10, 4, 8))
    u = compute_votes(x, w)
    v1 = dynamic_routing(u, num_iterations=1)
    expected = squash(jnp.sum(u / 10.0, axis=1), axis=-1)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(expected),
                               rtol=1e-4, atol=1e-6)


def test_dynamic_routing_iterations_change_output():
    x = jax.random.normal(RNG, (2, 6, 8))
    w = jax.random.normal(RNG, (10, 4, 8))
    u = compute_votes(x, w)
    v1 = dynamic_routing(u, 1)
    v3 = dynamic_routing(u, 3)
    assert float(jnp.max(jnp.abs(v1 - v3))) > 1e-4


def test_k_means_routing_shapes():
    x = jax.random.normal(RNG, (2, 6, 8))
    w = jax.random.normal(RNG, (10, 4, 8))
    v = capsule_linear(x, w, routing='k_means')
    assert v.shape == (2, 10, 4)
    assert np.all(np.isfinite(np.asarray(v)))


def test_capsule_linear_grads_finite():
    x = jax.random.normal(RNG, (2, 6, 8))
    w = jax.random.normal(RNG, (10, 4, 8)) * 0.1

    def loss(w_):
        return jnp.sum(jnp.square(capsule_linear(x, w_)))

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_capsule_module_flagship_shapes():
    """Generator head: 48 caps of 8 -> 1024 caps of 32 (model.py:248);
    D head: 16 caps of 512 -> 201 caps of 16 (model.py:943)."""
    mod = CapsuleLinear(out_capsules=64, in_length=8, out_length=32)
    x = jax.random.normal(RNG, (2, 48, 8))
    vs = mod.init({'params': RNG}, x)
    out = mod.apply(vs, x)
    assert out.shape == (2, 64, 32)
    assert vs['params']['weight'].shape == (64, 32, 8)


def test_pallas_matches_reference_on_tpu():
    from text2img_ekl_tpu.ops.capsule import _tpu_backend
    if not _tpu_backend():
        pytest.skip('needs TPU backend')
    from text2img_ekl_tpu.ops.capsule_pallas import _forward
    x = jax.random.normal(RNG, (4, 48, 8))
    w = jax.random.normal(RNG, (256, 32, 8)) * 0.1
    ref = dynamic_routing(compute_votes(x, w), 3)
    out = _forward(x, w, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
