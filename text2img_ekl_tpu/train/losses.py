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

import jax
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


def compute_mean_covariance(img: jnp.ndarray):
    """Per-image channel mean and channel covariance (trainer.py:29-47).

    ``img`` is NHWC; returns (mu [B, C], covariance [B, C, C]) where the
    covariance is E[(x-mu)(x-mu)^T] over the H*W pixels — the reference's
    values modulo its NCHW [B, C, 1, 1] mu shape.
    """
    img = img.astype(jnp.float32)
    b, h, w, c = img.shape
    mu = jnp.mean(img, axis=(1, 2))                      # [B, C]
    hat = (img - mu[:, None, None, :]).reshape(b, h * w, c)
    cov = jnp.einsum('bpc,bpd->bcd', hat, hat) / (h * w)
    return mu, cov


def color_consistency_loss(imgs, coeff: float) -> jnp.ndarray:
    """StackGAN++ color-consistency regularization between consecutive
    stage outputs: coeff * MSE(mu_hi, sg(mu_lo)) + coeff * 5 *
    MSE(cov_hi, sg(cov_lo)). The reference carries the helper
    (trainer.py:29-47) and the COEFF.COLOR_LOSS key (miscc/config.py:61)
    from upstream StackGAN-v2, where this is its exact consumer."""
    total = jnp.zeros((), jnp.float32)
    for lo, hi in zip(imgs[:-1], imgs[1:]):
        mu_lo, cov_lo = compute_mean_covariance(
            jax.lax.stop_gradient(lo.astype(jnp.float32)))
        mu_hi, cov_hi = compute_mean_covariance(hi)
        total += coeff * jnp.mean(jnp.square(mu_hi - mu_lo))
        total += coeff * 5.0 * jnp.mean(jnp.square(cov_hi - cov_lo))
    return total


def nll_loss(log_probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Negative log likelihood with integer class targets, mean reduction."""
    picked = jnp.take_along_axis(
        log_probs.astype(jnp.float32), targets[:, None], axis=1)[:, 0]
    return -jnp.mean(picked)
