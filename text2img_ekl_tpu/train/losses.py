"""GAN loss functions.

Numerically faithful ports of the reference loss helpers:

  * ``bce``      — torch nn.BCELoss over probabilities (the D heads emit
                   sigmoids; criterion at cub_trainer_splitz_cap_ca.py:512),
                   mean reduction, inputs clamped away from {0,1} the way
                   torch clamps log to -100.
  * ``ce_loss``  — soft-target cross entropy over log-probabilities,
                   normalized by batch only (cub_trainer_splitz_cap_ca.py:60-65).
  * ``kl_loss``  — -0.5 * mean(1 + logvar - mu^2 - exp(logvar)), mean over
                   *all* elements (cub_trainer_splitz_cap_ca.py:54-58).
  * ``nll_loss`` — torch nn.NLLLoss over log-probs + integer targets
                   (used by the legacy entity-D path, trainer.py:295).

All computed in float32.
"""

from __future__ import annotations

import jax.numpy as jnp

_LOG_CLAMP = 100.0


def bce(p: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy over probabilities, mean reduction.

    Probabilities are clipped so a fully-saturated sigmoid yields the same
    -100 clamped log torch uses without an infinite/NaN gradient.
    """
    # clip bounds chosen so 1/p stays finite in f32 (no inf*0 -> NaN in the
    # gradient at exact saturation) while log(p) stays above torch's -100
    p = jnp.clip(p.astype(jnp.float32), 1e-37, 1.0 - 1e-7)
    target = target.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(p), -_LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-p), -_LOG_CLAMP)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def ce_loss(logq: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Soft-target CE: -sum(p * logq) / batch."""
    n = p.shape[0]
    return -jnp.sum(p.astype(jnp.float32) * logq.astype(jnp.float32)) / n


def kl_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, sigma) || N(0, 1)) averaged over every element."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    element = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * jnp.mean(element)


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Negative log likelihood with integer class targets, mean reduction."""
    picked = jnp.take_along_axis(
        log_probs.astype(jnp.float32), targets[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)
