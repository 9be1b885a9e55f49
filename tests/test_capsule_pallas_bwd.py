"""Fused Pallas capsule backward: parity vs autodiff (TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.ops.capsule import (
    _tpu_backend, compute_votes, dynamic_routing)

pytestmark = pytest.mark.skipif(not _tpu_backend(),
                                reason='needs TPU backend')


@pytest.mark.parametrize('shape', [
    (4, 48, 8, 256, 32),   # generator-head-like
    (4, 16, 512, 201, 16),  # D-classifier-head-like
])
def test_fused_backward_matches_autodiff(shape):
    from text2img_ekl_tpu.ops.capsule_pallas import _backward
    B, IN, IL, OUT, OL = shape
    kx, kw, kg = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(kx, (B, IN, IL)) * 0.5
    w = jax.random.normal(kw, (OUT, OL, IL)) * 0.1
    g = jax.random.normal(kg, (B, OUT, OL))

    def ref(x_, w_):
        return dynamic_routing(compute_votes(x_, w_), 3)

    _, vjp = jax.vjp(ref, x, w)
    dx_ref, dw_ref = vjp(g)
    dx, dw = _backward(x, w, g, 3)
    for a, b in [(dx, dx_ref), (dw, dw_ref)]:
        rel = float(jnp.abs(a - b).mean() / (jnp.abs(b).mean() + 1e-12))
        assert rel < 2e-2, rel
        assert np.all(np.isfinite(np.asarray(a)))


def test_custom_vjp_grads_flow():
    from text2img_ekl_tpu.ops.capsule_pallas import capsule_linear_pallas
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 48, 8))
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 32, 8)) * 0.1

    def loss(x, w):
        return jnp.sum(jnp.square(capsule_linear_pallas(x, w, 3)))

    dx, dw = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, w)
    assert np.all(np.isfinite(np.asarray(dx)))
    assert float(jnp.abs(dw).max()) > 0
