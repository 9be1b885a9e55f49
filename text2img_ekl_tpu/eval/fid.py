"""Frechet Inception Distance, on-device activations + host sqrtm.

Port of the reference fid.py: pool_3 activations (fid.py:68-103) come from
the JAX InceptionV3 on the accelerator; mu/sigma reduce on device; the
matrix square root runs on host via scipy exactly as the reference does
(fid.py:105-160), with the same eps-jitter on singular covariances and
imaginary-component guard.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.inception_v3 import (
    InceptionV3, make_inception, preprocess_frozen, preprocess_uint8)


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2,
                               eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 sqrt(C1 C2)) (fid.py:105-160)."""
    from scipy import linalg

    mu1 = np.atleast_1d(np.asarray(mu1))
    mu2 = np.atleast_1d(np.asarray(mu2))
    sigma1 = np.atleast_2d(np.asarray(sigma1))
    sigma2 = np.atleast_2d(np.asarray(sigma2))
    assert mu1.shape == mu2.shape
    assert sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm(
            (sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError('Imaginary component {}'.format(m))
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_activation_statistics(
        activations: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """mu, sigma over pool_3 activations (fid.py:162-187)."""
    act = np.asarray(activations)
    mu = np.mean(act, axis=0)
    sigma = np.cov(act, rowvar=False)
    return mu, sigma


class FIDScorer:
    """pool_3 activation extractor + FID computation.

    ``flavor='fid'`` selects the frozen-2015-graph tower (the mixed_10
    max-pool quirk) AND its exact input chain — legacy TF1 bilinear resize
    + (x-128)/128 — which is what reference FID numbers are computed with
    (fid.py:95 feeds 0..255 at 'ExpandDims:0', before the graph's own
    resize/normalize ops). Build variables with
    convert_tf.frozen_pb_to_inception, or use ``from_frozen_pb``.
    """

    def __init__(self, variables, num_classes: int = 1000,
                 batch_size: int = 50, flavor: str = 'slim'):
        self.model = make_inception(num_classes, flavor)
        self.variables = variables
        self.batch_size = batch_size
        self.frozen_input = flavor == 'fid'

        def pool3(vars_, images):
            # images: [0,255] floats; preprocessing runs on device.
            x = (preprocess_frozen(images) if self.frozen_input
                 else preprocess_uint8(images))
            _, ep = self.model.apply(vars_, x)
            return ep['pool_3']

        self._pool3 = jax.jit(pool3)

        def pool3_row(vars_, images_cb, si):
            # one caption row of a [C, B, H, W, 3] uint8 stack (the
            # direct-eval path); dynamic index -> one compiled program
            return pool3(vars_, images_cb[si].astype(jnp.float32))

        self._pool3_row = jax.jit(pool3_row)
        self._act_rows = []  # [B, 2048] rows, device until SPILL_AFTER

    #: device-resident activation rows held before spilling to host —
    #: the same HBM bound InceptionScorer.SPILL_AFTER provides (a
    #: 30k-image protocol would otherwise pin ~245 MB of activations on
    #: top of the pipeline's pending uint8 stacks and both towers)
    SPILL_AFTER = 25000

    def add_uint8_row(self, images_cb, si: int) -> None:
        """Accumulate pool_3 activations for caption row ``si`` of a
        device-resident uint8 stack — one dispatch, no host fetch
        (TPU_EVAL_DIRECT; replaces the reference's PNG dump + reload
        before FID, fid.py:208-219)."""
        self._act_rows.append(self._pool3_row(
            self.variables, images_cb, jnp.asarray(si, jnp.int32)))
        n_dev = sum(a.shape[0] for a in self._act_rows
                    if not isinstance(a, np.ndarray))
        if n_dev >= self.SPILL_AFTER:
            # _to_host, not bare np.asarray: a multi-host-sharded stack
            # yields non-fully-addressable prediction arrays, and the IS
            # scorer's spill already handles (dedups/sorts) that case —
            # share the one correct implementation
            from .inception_score import InceptionScorer
            self._act_rows = [InceptionScorer._to_host(a)
                              for a in self._act_rows]

    def accumulated_statistics(self, reset: bool = True):
        """(mu, sigma) over every activation row queued by
        ``add_uint8_row``."""
        acts = np.concatenate([np.asarray(a) for a in self._act_rows], 0)
        if reset:
            self._act_rows = []
        return calculate_activation_statistics(acts)

    def accumulated_fid_against_stats(self, stats_npz_path: str,
                                      reset: bool = True) -> float:
        with np.load(stats_npz_path) as f:
            mu_ref, sigma_ref = f['mu'][:], f['sigma'][:]
        mu, sigma = self.accumulated_statistics(reset)
        return calculate_frechet_distance(mu, sigma, mu_ref, sigma_ref)

    @classmethod
    def from_frozen_pb(cls, pb_path: str, batch_size: int = 50):
        """The reference-faithful scorer: weights + semantics of
        classify_image_graph_def.pb (fid.py:35-66)."""
        from .convert_tf import frozen_pb_to_inception
        variables, n = frozen_pb_to_inception(pb_path)
        return cls(variables, n, batch_size, flavor='fid')

    def activations_uint8(self, images: np.ndarray) -> np.ndarray:
        """images: NHWC uint8 [0,255] -> [N, 2048] activations."""
        outs = []
        for i in range(0, len(images), self.batch_size):
            batch = jnp.asarray(
                np.asarray(images[i:i + self.batch_size], np.float32))
            outs.append(np.asarray(self._pool3(self.variables, batch)))
        return np.concatenate(outs, 0)

    def activations_gan(self, images) -> np.ndarray:
        """images: NHWC in [-1, 1] (GAN output): mapped to the 0..255
        domain the reference feeds FID with (its eval dumps PNGs and
        reloads them, fid.py:208-219; quantization is negligible)."""
        outs = []
        for i in range(0, len(images), self.batch_size):
            batch = jnp.asarray(images[i:i + self.batch_size])
            batch = (batch + 1.0) * 127.5
            outs.append(np.asarray(self._pool3(self.variables, batch)))
        return np.concatenate(outs, 0)

    def statistics(self, images: np.ndarray, uint8: bool = True):
        act = self.activations_uint8(images) if uint8 \
            else self.activations_gan(images)
        return calculate_activation_statistics(act)

    def fid_between(self, images1, images2, uint8: bool = True) -> float:
        mu1, s1 = self.statistics(images1, uint8)
        mu2, s2 = self.statistics(images2, uint8)
        return calculate_frechet_distance(mu1, s1, mu2, s2)

    def fid_against_stats(self, images, stats_npz_path: str,
                          uint8: bool = True) -> float:
        """Compare against precomputed .npz stats (fid.py:208-219)."""
        with np.load(stats_npz_path) as f:
            mu_ref, sigma_ref = f['mu'][:], f['sigma'][:]
        mu, sigma = self.statistics(images, uint8)
        return calculate_frechet_distance(mu, sigma, mu_ref, sigma_ref)
