"""Shared G/D building blocks, TPU-native.

Re-designs the reference blocks (reference: model.py:50-123, 811-850) as Flax
modules in NHWC layout (TPU-friendly): GLU, up-sampling block, residual block,
down-sampling block and the 16x image encoder.

Numerics follow the reference's training recipe:
  * convolutions are bias-free 3x3/4x4 (model.py:79-82, 822-828),
  * BatchNorm uses per-replica batch statistics in training (faithful to
    torch.nn.DataParallel semantics, SURVEY.md section 7.4) with eps=1e-5 and
    running-average momentum 0.1,
  * conv/linear weights use orthogonal init and BatchNorm scale ~ N(1, 0.02)
    (reference: trainer.py:63-73 / cub_trainer_splitz_cap_ca.py:67-77).

Compute dtype is configurable (bfloat16 by default) with float32 parameters
and float32 BatchNorm statistics; XLA fuses the dtype casts into the
surrounding convolutions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Orthogonal init matches torch.nn.init.orthogonal_ on the (fan_in, fan_out)
# matricization of the kernel: flax kernels are (kh, kw, in, out) and
# column_axis=-1 orthogonalizes over the flattened leading axes.
orthogonal_init = jax.nn.initializers.orthogonal(scale=1.0, column_axis=-1)


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm scale ~ N(1.0, 0.02) (reference: trainer.py:71-72)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def glu(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-halving gated linear unit (reference: model.py:68-76).

    Splits the trailing (channel) axis in half: a * sigmoid(b).
    """
    nc = x.shape[-1]
    assert nc % 2 == 0, 'channels dont divide 2!'
    nc = nc // 2
    return x[..., :nc] * jax.nn.sigmoid(x[..., nc:])


class GLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return glu(x)


# BatchNorm compute dtype. float32 is reference-faithful; bfloat16 halves
# the BN-boundary HBM traffic (TPU reduces accumulate in f32 either way) —
# set via config TPU_BN_DTYPE before model construction.
BN_DTYPE = jnp.float32


class BatchNorm(nn.Module):
    """BatchNorm with reference-faithful defaults.

    Statistics are computed over the local (per-replica) batch, matching
    DataParallel per-GPU statistics; running averages use momentum 0.1
    (torch default). ``use_running_average`` selects eval mode.
    """

    use_running_average: bool = False
    dtype: Dtype = None  # None -> module-level BN_DTYPE

    @nn.compact
    def __call__(self, x, use_running_average: bool = None):
        ura = self.use_running_average if use_running_average is None \
            else use_running_average
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype or BN_DTYPE,
            param_dtype=jnp.float32,
            scale_init=bn_scale_init,
            bias_init=jax.nn.initializers.zeros,
        )(x)


class Dense(nn.Module):
    """Linear layer with orthogonal init (reference: trainer.py:74-77)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=orthogonal_init,
            bias_init=jax.nn.initializers.zeros,
        )(x)


class Conv3x3(nn.Module):
    """3x3 stride-1 pad-1 bias-free conv (reference: model.py:79-82)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (3, 3), strides=1, padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=orthogonal_init,
        )(x)


class Conv4x4s2(nn.Module):
    """4x4 stride-2 pad-1 bias-free conv (reference: model.py:822-828)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (4, 4), strides=2, padding=1, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=orthogonal_init,
        )(x)


class Conv4x4s4(nn.Module):
    """4x4 stride-4 valid conv used by D logit heads (reference: model.py:886-888).

    Collapses the 4x4 spatial map to 1x1; has a bias (torch Conv2d default).
    """

    features: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (4, 4), strides=4, padding=0, use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=orthogonal_init,
            bias_init=jax.nn.initializers.zeros,
        )(x)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x spatial upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class UpBlock(nn.Module):
    """nearest-2x upsample -> conv3x3(2*out) -> BN -> GLU (model.py:87-94)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = upsample_nearest_2x(x)
        x = Conv3x3(self.features * 2, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return glu(x).astype(self.dtype)


class Block3x3Relu(nn.Module):
    """conv3x3(2*out) -> BN -> GLU, keeps spatial size (model.py:98-104)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3x3(self.features * 2, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return glu(x).astype(self.dtype)


class ResBlock(nn.Module):
    """conv-BN-GLU-conv-BN + skip (model.py:107-123)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = Conv3x3(self.features * 2, dtype=self.dtype)(x)
        out = BatchNorm(use_running_average=not train)(out)
        out = glu(out).astype(self.dtype)
        out = Conv3x3(self.features, dtype=self.dtype)(out)
        out = BatchNorm(use_running_average=not train)(out)
        return (out + residual.astype(out.dtype)).astype(self.dtype)


class Block3x3LeakyRelu(nn.Module):
    """conv3x3 -> BN -> LeakyReLU(0.2) (model.py:812-818)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv3x3(self.features, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.leaky_relu(x, 0.2).astype(self.dtype)


class DownBlock(nn.Module):
    """4x4-s2 conv -> BN -> LeakyReLU(0.2), halves spatial (model.py:822-828)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv4x4s2(self.features, dtype=self.dtype)(x)
        x = BatchNorm(use_running_average=not train)(x)
        return nn.leaky_relu(x, 0.2).astype(self.dtype)


class EncodeBy16(nn.Module):
    """Four stride-2 convs: 3 -> ndf -> 2ndf -> 4ndf -> 8ndf (model.py:832-850).

    First conv has no BatchNorm, matching the reference.
    """

    ndf: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = Conv4x4s2(self.ndf, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2).astype(self.dtype)
        x = DownBlock(self.ndf * 2, dtype=self.dtype)(x, train)
        x = DownBlock(self.ndf * 4, dtype=self.dtype)(x, train)
        x = DownBlock(self.ndf * 8, dtype=self.dtype)(x, train)
        return x
