"""Inception Score, on-device.

Replaces the reference's TF1 session round trip (inception_score.py;
the per-step GPU->CPU->TF hand-off at cub_trainer_splitz_cap_ca.py:613-623)
with a jitted JAX InceptionV3 forward on the accelerator that produced the
images. Supports both IS flavors:

  * fine-tuned      — 50+1-class CUB/flowers checkpoint; the background
                      logit is sliced off before softmax
                      (inception_score.py:242),
  * general         — ImageNet classes (the frozen 2015 graph flavor,
                      inception_score_general.py).

The split-KL score math is a faithful port of
cub_trainer_splitz_cap_ca.py:87-98 / inception_score.py:117-160.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.inception_v3 import (
    InceptionV3, make_inception, preprocess_frozen, preprocess_gan_output,
    preprocess_uint8)


def compute_inception_score(predictions: np.ndarray,
                            num_splits: int = 1) -> Tuple[float, float]:
    """exp of the mean split-KL (cub_trainer_splitz_cap_ca.py:87-98)."""
    scores = []
    n = predictions.shape[0]
    for i in range(num_splits):
        part = predictions[i * n // num_splits:(i + 1) * n // num_splits, :]
        kl = part * (np.log(part) -
                     np.log(np.expand_dims(np.mean(part, 0), 0)))
        kl = np.mean(np.sum(kl, 1))
        scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))


def negative_log_posterior_probability(predictions: np.ndarray,
                                       num_splits: int = 1):
    """-log max-prob diagnostic (cub_trainer_splitz_cap_ca.py:100-110)."""
    scores = []
    n = predictions.shape[0]
    for i in range(num_splits):
        part = predictions[i * n // num_splits:(i + 1) * n // num_splits, :]
        scores.append(float(np.mean(-1.0 * np.log(np.max(part, 1)))))
    return float(np.mean(scores)), float(np.std(scores))


class InceptionScorer:
    """Stateful scorer: accumulate prediction batches, then score.

    ``variables`` are InceptionV3 flax variables (from the checkpoint
    converter or random for smoke tests). ``finetuned=True`` slices off the
    background class before softmax (inception_score.py:242).
    """

    def __init__(self, variables, num_classes: int = 51,
                 finetuned: bool = True, batch_size: int = 64,
                 flavor: str = 'slim', dtype=None):
        """``dtype=jnp.bfloat16`` speeds the tower ~26%% — fine for the
        in-training relative gate; offline scoring should stay f32."""
        self.model = make_inception(num_classes, flavor,
                                    dtype=dtype or jnp.float32)
        self.variables = variables
        self.finetuned = finetuned
        self.batch_size = batch_size
        self.frozen_input = flavor == 'fid'
        self.predictions: List[Any] = []  # device-resident until score()
        self._rows = 0

        def predict(vars_, images):
            if self.frozen_input:
                # frozen-graph semantics: 0..255 input, legacy resize,
                # (x-128)/128 (inception_score_general.py:78-99)
                x = preprocess_frozen((images + 1.0) * 127.5)
            else:
                x = preprocess_gan_output(images)
            logits, _ = self.model.apply(vars_, x)
            if finetuned:
                logits = logits[:, 1:]  # drop background class
            return jax.nn.softmax(logits, axis=-1)

        self._predict = jax.jit(predict)

        def predict_u8(vars_, images):
            # directory-eval input: NHWC uint8 [0, 255]
            if self.frozen_input:
                x = preprocess_frozen(images.astype(jnp.float32))
            else:
                x = preprocess_uint8(images)
            logits, _ = self.model.apply(vars_, x)
            if finetuned:
                logits = logits[:, 1:]
            return jax.nn.softmax(logits, axis=-1)

        self._predict_u8 = jax.jit(predict_u8)

        def predict_u8_row(vars_, images_cb, si):
            # one caption row of a [C, B, H, W, 3] uint8 stack; the
            # dynamic index keeps a single compiled program across rows
            return predict_u8(vars_, images_cb[si])

        self._predict_u8_row = jax.jit(predict_u8_row)

    @classmethod
    def from_frozen_pb(cls, pb_path: str, batch_size: int = 64, dtype=None):
        """General-IS scorer off classify_image_graph_def.pb — weights AND
        input chain of inception_score_general.py (1008-way softmax, no
        background slice, logits bias ignored)."""
        from .convert_tf import frozen_pb_to_inception
        variables, n = frozen_pb_to_inception(pb_path)
        return cls(variables, n, finetuned=False, batch_size=batch_size,
                   flavor='fid', dtype=dtype)

    def predict_batch(self, images) -> jnp.ndarray:
        """images: NHWC in [-1, 1] (GAN output)."""
        return self._predict(self.variables, images)

    def predict_uint8(self, images: np.ndarray) -> jnp.ndarray:
        """images: NHWC uint8 [0, 255] (directory eval path). Jitted:
        an eager Inception forward is hundreds of ops and the tunneled
        backend dispatches each one eagerly at ~100 ms (PERF.md) —
        the 30k-image protocol would take hours instead of minutes."""
        return self._predict_u8(self.variables, jnp.asarray(images))

    #: device-resident prediction rows held before spilling to host
    #: (25k x 1008 f32 ~ 100 MB; normal gates score at 3000 and never
    #: spill — this bounds HBM if score() is deferred for a long time)
    SPILL_AFTER = 25000

    @staticmethod
    def _to_host(p) -> np.ndarray:
        """Host rows of a prediction array. On a multi-host mesh the
        [B, C] array spans non-addressable devices (step fakes are
        sharded over the GLOBAL data axis) and np.asarray raises —
        fetch this process's addressable shards instead; each process
        then scores its local pool and the trainer's gate broadcasts
        process 0's decision."""
        if isinstance(p, jax.Array) and not p.is_fully_addressable:
            # Deduplicate by shard index (a partially-replicated array —
            # possible under the gspmd lowering — yields the same row
            # range on several local devices; counting each copy would
            # inflate the pool) and order by row start, which backends
            # do not guarantee for addressable_shards.
            by_index = {}
            for s in p.addressable_shards:
                key = tuple((sl.start or 0, sl.stop) for sl in s.index)
                by_index.setdefault(key, s)
            shards = sorted(by_index.values(),
                            key=lambda s: s.index[0].start or 0)
            return np.concatenate(
                [np.asarray(s.data) for s in shards], axis=0)
        return np.asarray(p)

    def add(self, images) -> None:
        """Queue one prediction batch WITHOUT a host sync: the [B, C]
        prob array stays device-resident until score() materializes it,
        so the gate never drains the training pipeline (a host fetch on
        the tunneled backend costs ~100 ms; measured ~125 ms/gate before
        this, PERF.md). Past SPILL_AFTER queued rows, everything spills
        to host in one drain so HBM use stays bounded."""
        self._queue(self.predict_batch(images))

    def add_uint8_row(self, images_cb, si: int) -> None:
        """Queue predictions for caption row ``si`` of a device-resident
        ``[C, B, H, W, 3]`` uint8 stack — ONE jitted dispatch and no host
        fetch (the TPU_EVAL_DIRECT path: the offline protocol's sampler
        emits all-caption uint8 stacks, and scoring them in place skips
        the 30k-PNG disk round trip the reference does,
        is_of_dir.py / cub_trainer_splitz_cap_ca.py:776-911)."""
        self._queue(self._predict_u8_row(self.variables, images_cb,
                                         jnp.asarray(si, jnp.int32)))

    def _queue(self, p) -> None:
        self.predictions.append(p)
        self._rows += p.shape[0]  # global rows: symmetric across hosts
        n_dev = sum(q.shape[0] for q in self.predictions
                    if not isinstance(q, np.ndarray))
        if n_dev >= self.SPILL_AFTER:
            self.predictions = [self._to_host(q) for q in self.predictions]

    @property
    def count(self) -> int:
        """Rows accumulated since the last reset, counted in GLOBAL
        batch rows so every process's gate trips at the same step."""
        return self._rows

    def score(self, num_splits: int = 1,
              reset: bool = True) -> Tuple[float, float]:
        preds = np.concatenate(
            [self._to_host(p) for p in self.predictions], 0)
        if reset:
            self.predictions = []
            self._rows = 0
        return compute_inception_score(preds, num_splits)

    def score_images(self, images: np.ndarray,
                     num_splits: int = 10) -> Tuple[float, float]:
        """Directory-eval path: uint8 images -> IS
        (inception_score.py:117-160)."""
        preds = []
        for i in range(0, len(images), self.batch_size):
            batch = np.asarray(images[i:i + self.batch_size])
            preds.append(np.asarray(self.predict_uint8(batch)))
        return compute_inception_score(np.concatenate(preds, 0), num_splits)
