"""InceptionV3 forward pass in JAX/Flax for IS and FID.

Replaces the reference's three TF1/torch inception paths with one TPU
implementation:

  * the vendored TF-slim tower used by the fine-tuned IS model
    (inception/slim/inception_model.py:52-330, driven by inception_score.py),
  * the frozen 2015 ImageNet graph used by inception_score_general.py and
    fid.py (pool_3 activations),
  * the torchvision InceptionV3 used in-process by trainer.py:469 /
    model.py:18-47.

The architecture below follows the public Inception-V3 structure (Szegedy et
al. 2015) in its TF-slim layout: BN after every conv (no scale, eps=1e-3),
ReLU, 'SAME' padding unless noted. Endpoints mirror slim's names so
checkpoint conversion (eval/convert_tf.py) is a name-mapping exercise, and
``pool_3`` (2048-d pre-logits) is exposed for FID.

Runs in eval mode only (moving statistics), NHWC, bfloat16-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """conv -> BN(eps 1e-3) -> ReLU.

    ``bn_scale=False`` is the TF-slim flavor (no gamma,
    inception/slim/ops.py:43); ``bn_scale=True`` matches torchvision's
    BasicConv2d, enabling bit-parity with the torch weights the reference's
    general-IS path downloads (model.py:18-31).
    """

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    padding: Any = 'SAME'
    bn_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=True, use_scale=self.bn_scale,
                         use_bias=True, epsilon=1e-3, momentum=0.9997,
                         dtype=jnp.float32, param_dtype=jnp.float32)(x)
        return nn.relu(x).astype(self.dtype)


def _max_pool(x, window=3, stride=2, padding='VALID'):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


def _avg_pool(x, window=3, stride=1, padding='SAME',
              count_include_pad=True):
    """Branch-pool average. TF/slim/keras exclude padded cells from the
    divisor; torch's F.avg_pool2d includes them (its default) — the flavor
    switch matters at spatial borders."""
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=padding, count_include_pad=count_include_pad)


class Mixed35(nn.Module):
    """35x35 inception block (slim mixed_35x35x256a..288b)."""

    pool_features: int
    bn_scale: bool = False
    torch_pool: bool = True  # include padding in avg-pool divisor
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = ConvBN(64, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch1x1')(x)
        b1 = ConvBN(48, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch5x5_1')(x)
        b1 = ConvBN(64, (5, 5), bn_scale=self.bn_scale, dtype=d, name='branch5x5_2')(b1)
        b2 = ConvBN(64, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_1')(x)
        b2 = ConvBN(96, (3, 3), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_2')(b2)
        b2 = ConvBN(96, (3, 3), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_3')(b2)
        b3 = _avg_pool(x, count_include_pad=self.torch_pool)
        b3 = ConvBN(self.pool_features, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch_pool')(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Mixed17Reduce(nn.Module):
    """35->17 grid reduction (slim mixed_17x17x768a)."""

    bn_scale: bool = False
    torch_pool: bool = True  # unused (max-pool only); kept for uniform ctor
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = ConvBN(384, (3, 3), strides=2, padding='VALID', bn_scale=self.bn_scale, dtype=d,
                    name='branch3x3')(x)
        b1 = ConvBN(64, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_1')(x)
        b1 = ConvBN(96, (3, 3), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_2')(b1)
        b1 = ConvBN(96, (3, 3), strides=2, padding='VALID', bn_scale=self.bn_scale, dtype=d,
                    name='branch3x3dbl_3')(b1)
        b2 = _max_pool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed17(nn.Module):
    """17x17 inception block with 7x1/1x7 factorization (mixed_17x17x768b..e)."""

    c7: int  # 128, 160, or 192
    bn_scale: bool = False
    torch_pool: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.c7
        b0 = ConvBN(192, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch1x1')(x)
        b1 = ConvBN(c7, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7_1')(x)
        b1 = ConvBN(c7, (1, 7), bn_scale=self.bn_scale, dtype=d, name='branch7x7_2')(b1)
        b1 = ConvBN(192, (7, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7_3')(b1)
        b2 = ConvBN(c7, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7dbl_1')(x)
        b2 = ConvBN(c7, (7, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7dbl_2')(b2)
        b2 = ConvBN(c7, (1, 7), bn_scale=self.bn_scale, dtype=d, name='branch7x7dbl_3')(b2)
        b2 = ConvBN(c7, (7, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7dbl_4')(b2)
        b2 = ConvBN(192, (1, 7), bn_scale=self.bn_scale, dtype=d, name='branch7x7dbl_5')(b2)
        b3 = _avg_pool(x, count_include_pad=self.torch_pool)
        b3 = ConvBN(192, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch_pool')(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class Mixed8Reduce(nn.Module):
    """17->8 grid reduction (slim mixed_8x8x1280a)."""

    bn_scale: bool = False
    torch_pool: bool = True  # unused (max-pool only); kept for uniform ctor
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = ConvBN(192, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3_1')(x)
        b0 = ConvBN(320, (3, 3), strides=2, padding='VALID', bn_scale=self.bn_scale, dtype=d,
                    name='branch3x3_2')(b0)
        b1 = ConvBN(192, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7x3_1')(x)
        b1 = ConvBN(192, (1, 7), bn_scale=self.bn_scale, dtype=d, name='branch7x7x3_2')(b1)
        b1 = ConvBN(192, (7, 1), bn_scale=self.bn_scale, dtype=d, name='branch7x7x3_3')(b1)
        b1 = ConvBN(192, (3, 3), strides=2, padding='VALID', bn_scale=self.bn_scale, dtype=d,
                    name='branch7x7x3_4')(b1)
        b2 = _max_pool(x)
        return jnp.concatenate([b0, b1, b2], axis=-1)


class Mixed8(nn.Module):
    """8x8 inception block with split 3x3 branches (mixed_8x8x2048a/b).

    ``pool_max=True`` reproduces a quirk of the frozen 2015 ImageNet export
    (the graph fid.py:35-66 / inception_score_general.py:56-99 import):
    its LAST 8x8 block ('mixed_10') uses a 3x3 MAX pool in the pool branch
    where every other variant of Inception-V3 (slim, keras, torchvision)
    uses an average pool. FID parity with the reference depends on
    matching that exact graph.
    """

    bn_scale: bool = False
    torch_pool: bool = True
    pool_max: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b0 = ConvBN(320, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch1x1')(x)
        b1 = ConvBN(384, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3_1')(x)
        b1a = ConvBN(384, (1, 3), bn_scale=self.bn_scale, dtype=d, name='branch3x3_2a')(b1)
        b1b = ConvBN(384, (3, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3_2b')(b1)
        b1 = jnp.concatenate([b1a, b1b], axis=-1)
        b2 = ConvBN(448, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_1')(x)
        b2 = ConvBN(384, (3, 3), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_2')(b2)
        b2a = ConvBN(384, (1, 3), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_3a')(b2)
        b2b = ConvBN(384, (3, 1), bn_scale=self.bn_scale, dtype=d, name='branch3x3dbl_3b')(b2)
        b2 = jnp.concatenate([b2a, b2b], axis=-1)
        if self.pool_max:
            b3 = _max_pool(x, 3, 1, 'SAME')
        else:
            b3 = _avg_pool(x, count_include_pad=self.torch_pool)
        b3 = ConvBN(192, (1, 1), bn_scale=self.bn_scale, dtype=d, name='branch_pool')(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
    """Full tower; returns (logits, endpoints) with endpoints['pool_3']."""

    num_classes: int = 1000
    bn_scale: bool = False
    torch_pool: bool = True
    last_pool_max: bool = False  # 'mixed_10' max-pool quirk, see Mixed8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        d = self.dtype
        ep = {}
        x = x.astype(d)
        x = ConvBN(32, (3, 3), strides=2, padding='VALID', bn_scale=self.bn_scale, dtype=d,
                   name='conv0')(x)
        x = ConvBN(32, (3, 3), padding='VALID', bn_scale=self.bn_scale, dtype=d, name='conv1')(x)
        x = ConvBN(64, (3, 3), bn_scale=self.bn_scale, dtype=d, name='conv2')(x)
        x = _max_pool(x)
        x = ConvBN(80, (1, 1), padding='VALID', bn_scale=self.bn_scale, dtype=d, name='conv3')(x)
        x = ConvBN(192, (3, 3), padding='VALID', bn_scale=self.bn_scale, dtype=d, name='conv4')(x)
        x = _max_pool(x)
        x = Mixed35(32, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_35x35x256a')(x)
        x = Mixed35(64, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_35x35x288a')(x)
        x = Mixed35(64, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_35x35x288b')(x)
        x = Mixed17Reduce(bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_17x17x768a')(x)
        x = Mixed17(128, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_17x17x768b')(x)
        x = Mixed17(160, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_17x17x768c')(x)
        x = Mixed17(160, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_17x17x768d')(x)
        x = Mixed17(192, bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_17x17x768e')(x)
        ep['mixed_17x17x768e'] = x
        x = Mixed8Reduce(bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_8x8x1280a')(x)
        x = Mixed8(bn_scale=self.bn_scale, torch_pool=self.torch_pool, dtype=d, name='mixed_8x8x2048a')(x)
        x = Mixed8(bn_scale=self.bn_scale, torch_pool=self.torch_pool,
                   pool_max=self.last_pool_max, dtype=d, name='mixed_8x8x2048b')(x)
        # Global average pool == slim's 8x8 avg pool at 299 input; adaptive
        # for other input sizes (the frozen FID graph is also adaptive).
        x = jnp.mean(x, axis=(1, 2))
        pool3 = x.astype(jnp.float32)
        ep['pool_3'] = pool3
        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name='logits')(pool3)
        ep['logits'] = logits
        return logits, ep


def make_inception(num_classes: int = 1000, flavor: str = 'slim',
                   dtype=jnp.float32) -> 'InceptionV3':
    """Flavored constructor.

    'slim'  — TF-slim/keras semantics (BN without scale, border-exclusive
              avg pools): the fine-tuned IS checkpoint and the frozen
              FID/general-IS graphs.
    'torch' — torchvision semantics (BN scale, border-inclusive avg pools):
              the in-process general-IS model (reference model.py:18-47).
    'fid'   — the frozen 2015 ImageNet export exactly: slim semantics plus
              the 'mixed_10' max-pool quirk (see Mixed8.pool_max); the graph
              fid.py and inception_score_general.py run on. Use with
              preprocess_frozen and eval/convert_tf.frozen_graph_to_flax.
    """
    if flavor == 'slim':
        return InceptionV3(num_classes=num_classes, bn_scale=False,
                           torch_pool=False, dtype=dtype)
    if flavor == 'torch':
        return InceptionV3(num_classes=num_classes, bn_scale=True,
                           torch_pool=True, dtype=dtype)
    if flavor == 'fid':
        return InceptionV3(num_classes=num_classes, bn_scale=False,
                           torch_pool=False, last_pool_max=True, dtype=dtype)
    raise ValueError(flavor)


def preprocess_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] HWC batch -> 299x299 in [-1, 1].

    Matches inception_score.py:72-83: bilinear resize on the raw pixels then
    /127.5 - 1.
    """
    x = images.astype(jnp.float32)
    if x.shape[1] != 299 or x.shape[2] != 299:
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), method='bilinear')
    return x * (2.0 / 255.0) - 1.0


def _resize_axis_legacy(x, axis: int, out_size: int):
    """One axis of TF1 ResizeBilinear: output i samples input i*in/out
    (f32 position arithmetic, as the TF kernel computes it), 2-tap lerp
    with the upper tap clamped to the last row/col."""
    import numpy as np
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    scale = np.float32(in_size / out_size)
    pos = np.arange(out_size, dtype=np.float32) * scale
    lo = np.floor(pos).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (pos - lo).astype(np.float32)
    shape = [1] * x.ndim
    shape[axis] = out_size
    xlo = jnp.take(x, lo, axis=axis)
    xhi = jnp.take(x, hi, axis=axis)
    return xlo + (xhi - xlo) * jnp.asarray(frac).reshape(shape)


def resize_bilinear_tf1(images: jnp.ndarray, size=(299, 299)) -> jnp.ndarray:
    """TF1 legacy ResizeBilinear (align_corners=False,
    half_pixel_centers=False), the resize baked into the frozen 2015 graph
    right after its input (feed point 'ExpandDims:0', fid.py:95 /
    inception_score_general.py:78-81).

    Output pixel i samples input coordinate i * in/out — no half-pixel
    shift and no antialiasing, unlike jax.image.resize's 'bilinear' (and
    not expressible with jax.image.scale_and_translate, which zeroes
    output taps past in-0.5 where TF clamps). Implemented as a separable
    static gather + lerp; index/fraction math is done in the same f32
    arithmetic as the TF kernel, at trace time.
    """
    x = images.astype(jnp.float32)
    x = _resize_axis_legacy(x, 1, size[0])
    x = _resize_axis_legacy(x, 2, size[1])
    return x


def preprocess_frozen(images: jnp.ndarray) -> jnp.ndarray:
    """[0,255] float/uint8 HWC batch -> the frozen graph's conv input.

    The 2015 graph normalizes (x - 128) * 0.0078125 after its legacy
    bilinear resize; both FID (fid.py:95) and general IS
    (inception_score_general.py:78) feed 0..255 images at that point.
    """
    x = resize_bilinear_tf1(images.astype(jnp.float32))
    return (x - 128.0) * 0.0078125


def preprocess_gan_output(images: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] GAN output batch (NHWC) -> 299x299 in [-1, 1].

    The in-training IS path converts [-1,1] to uint8-ish ints then /127.5-1
    (cub_trainer_splitz_cap_ca.py:621); the quantization is irrelevant to the
    score, so resize directly.
    """
    if images.shape[1] != 299 or images.shape[2] != 299:
        images = jax.image.resize(
            images, (images.shape[0], 299, 299, images.shape[3]),
            method='bilinear')
    return images
