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


def _clamped_log(x: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCELoss's log semantics: log(x) clamped to >= -100, with
    zero gradient where the clamp engages. The clamp region is selected
    by `where` BEFORE the log so a saturated input (x == 0, where a
    plain log is -inf and its pulled-back gradient is 0 * inf = NaN)
    stays finite in both passes."""
    # Threshold at the smallest NORMAL f32 rather than torch's exact
    # e^-100 (~3.7e-44): that value is subnormal and gets flushed to 0
    # in f32 folding/TPU arithmetic, which would defeat the clamp at
    # exact saturation. For subnormal x in (~1.4e-45, 1.2e-38) torch
    # would give log(x) in (-103, -87) vs our -100 — unreachable from a
    # sigmoid on hardware that flushes subnormals anyway.
    clamped = x < jnp.float32(1.2e-38)
    return jnp.where(clamped, -_LOG_CLAMP,
                     jnp.log(jnp.where(clamped, 1.0, x)))


def bce(p: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy over probabilities, mean reduction —
    torch.nn.BCELoss semantics including the -100 log clamp: a fully
    saturated wrong-way sigmoid contributes exactly 100 per element on
    BOTH sides (an earlier version clipped p to 1 - 1e-7 first, so the
    target-0/p->1 side bottomed out at ~16.1 and the printed D/G losses
    diverged from the reference by up to ~84 in exactly the saturated
    regimes GAN debugging cares about)."""
    # torch.nn.BCELoss *raises* on inputs outside [0, 1]; inside jit we
    # can't raise data-dependently, so clamp instead — a numerically
    # overshot probability (p = 1 + ulp makes 1-p negative) would
    # otherwise produce a silent NaN through log of a negative. The
    # clamp is exact-saturation-safe: {0, 1} endpoints are handled by
    # _clamped_log, and in-range sigmoid outputs pass through untouched.
    p = jnp.clip(p.astype(jnp.float32), 0.0, 1.0)
    target = target.astype(jnp.float32)
    return -jnp.mean(target * _clamped_log(p)
                     + (1.0 - target) * _clamped_log(1.0 - p))


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
