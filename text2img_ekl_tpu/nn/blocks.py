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
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops import conv_dw

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

# Joint-conv formulation for NextStageG: True = tile-free exact rewrite
# (default, see _JointConv3x3); False = materialized concat (A/B escape
# hatch — parameters are identical either way). Set via config
# TPU_SPLIT_JOINTCONV before model construction (generator.py applies it).
SPLIT_JOINT_CONV = True

# UpBlock upsample-conv formulation: True = fold the nearest-2x upsample
# into the conv weights (exact rewrite, see _SubpixelUpConv3x3; applies
# to train-mode calls only — forward-only sampling measured slower).
# Set via config TPU_SUBPIXEL_UP before model construction.
SUBPIXEL_UP = False

# 3x3 convs: compute the weight gradient with the Pallas streaming-dW
# kernel (ops/conv_dw.py) where the geometry supports it. Measured and
# REJECTED on this chip (0.66-1.03x vs XLA's emitter across the hot dW
# shapes — the in-VMEM lane-stacking copies dominate; PERF.md "Pallas
# dW kernel"); kept as an A/B escape hatch for other hardware. Set via
# config TPU_PALLAS_DW before model construction.
PALLAS_DW = False

# BatchNorm running-average momentum (torch default 0.1 "new fraction" ==
# flax momentum 0.9). The grouped-D running-average combination in
# train/step.py depends on this exact value — keep them in sync through
# this constant.
BN_MOMENTUM = 0.9


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
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            dtype=self.dtype or BN_DTYPE,
            param_dtype=jnp.float32,
            scale_init=bn_scale_init,
            bias_init=jax.nn.initializers.zeros,
        )(x)


# Fuse the BN normalize + GLU tail into one Pallas pass (ops/bn_glu.py):
# saves the full-width normalized-tensor materialization between BN and
# GLU. Parameters/variables are checkpoint-identical to the unfused path.
# Set via config TPU_FUSED_BN_GLU before model construction.
FUSED_BN_GLU = False


class _BNVars(nn.Module):
    """Variable container laid out exactly like flax nn.BatchNorm, so the
    fused module below is checkpoint-compatible with the plain one."""

    @nn.compact
    def __call__(self, c2: int):
        scale = self.param('scale', bn_scale_init, (c2,), jnp.float32)
        bias = self.param('bias', jax.nn.initializers.zeros, (c2,),
                          jnp.float32)
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda s: jnp.zeros(s, jnp.float32), (c2,))
        ra_var = self.variable('batch_stats', 'var',
                               lambda s: jnp.ones(s, jnp.float32), (c2,))
        return scale, bias, ra_mean, ra_var


class FusedBatchNormGLU(nn.Module):
    """BatchNorm (flax-identical statistics and running-average update)
    with the normalize+GLU tail as one fused pass."""

    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        c2 = x.shape[-1]
        scale, bias, ra_mean, ra_var = _BNVars(name='BatchNorm_0')(c2)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # flax nn.BatchNorm's statistics formula: f32 mean and mean of
            # squares over all non-channel axes, biased variance.
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(xf * xf, axes)
            var = mean2 - mean * mean
            if not self.is_initializing():
                ra_mean.value = BN_MOMENTUM * ra_mean.value + \
                    (1.0 - BN_MOMENTUM) * mean
                ra_var.value = BN_MOMENTUM * ra_var.value + \
                    (1.0 - BN_MOMENTUM) * var
        from ..ops.bn_glu import fused_bn_glu
        interpret = jax.default_backend() != 'tpu'
        return fused_bn_glu(x, mean, var, scale, bias, BN_DTYPE, interpret)


def bn_glu(x, train: bool, dtype, name: str = 'BatchNorm_0'):
    """The BN -> GLU tail shared by UpBlock / Block3x3Relu / ResBlock.

    Dispatches to the fused Pallas pass when FUSED_BN_GLU; explicit
    ``name`` keeps the parameter tree identical either way."""
    if FUSED_BN_GLU and x.ndim == 4:
        out = FusedBatchNormGLU(use_running_average=not train,
                                name=name)(x)
    else:
        out = glu(BatchNorm(use_running_average=not train, name=name)(x))
    return out.astype(dtype)


class Dense(nn.Module):
    """Linear layer with orthogonal init (reference: trainer.py:74-77)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # 'conv' tag: matmul outputs are remat anchors like conv outputs
        # (TPU_REMAT_G='conv', see Conv3x3).
        return checkpoint_name(nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=orthogonal_init,
            bias_init=jax.nn.initializers.zeros,
        )(x), 'conv')


class _JointConv3x3(nn.Module):
    """3x3 conv over ``concat(tiled(c_vec), h)`` without materializing the
    tile (reference semantics: model.py:408-416).

    The condition half of the kernel sees a spatially-constant input, so its
    contribution collapses to nine partial-sum kernels — one per
    (row-class, col-class) of the zero-padded window: interior outputs sum
    all 9 taps, edges 6, corners 4. The full contribution is then two tiny
    one-hot matmuls away. Exact rewrite of the concat conv (linearity), and
    the parameter ('kernel', shape (3,3,Cc+Ch,F), orthogonal init under the
    same scope path) is byte-identical to the nn.Conv it replaces, so
    checkpoints and init RNG streams are unchanged.

    Measured (PERF.md): the concat formulation pays a 134MB broadcast
    materialization plus a lane-misaligned 192-channel conv fwd+bwd — the
    single hottest op pair in the flagship step.
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h, c_vec):
        cc = c_vec.shape[-1]
        ch = h.shape[-1]
        kernel = self.param('kernel', orthogonal_init,
                            (3, 3, cc + ch, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        wc, wh = k[:, :, :cc, :], k[:, :, cc:, :]
        y = jax.lax.conv_general_dilated(
            h.astype(self.dtype), wh, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # Partial tap sums per window class: K(0)={1,2} (top/left edge),
        # K(1)={0,1,2} (interior), K(2)={0,1} (bottom/right edge).
        rows = jnp.stack([wc[1:].sum(0), wc.sum(0), wc[:2].sum(0)])
        T = jnp.stack([rows[:, 1:].sum(1), rows.sum(1), rows[:, :2].sum(1)],
                      axis=1)  # (3, 3, Cc, F)
        tile = jnp.einsum('bc,ijcf->bijf', c_vec.astype(self.dtype), T)
        s = h.shape[1]
        assert h.shape[1] == h.shape[2], \
            'joint conv border classes assume square feature maps'
        assert s >= 2, 'joint conv window classes need spatial size >= 2'
        idx = np.concatenate([[0], np.ones(s - 2, np.int64), [2]])
        R = jnp.asarray(np.eye(3, dtype=np.float32)[idx], self.dtype)
        full_c = jnp.einsum('si,bijf,tj->bstf', R, tile, R)
        return y + full_c


def fold_up2x_kernel(W):
    """(3, 3, C, F) -> (3, 3, C, 4F): fold a preceding nearest-2x upsample
    into the conv weights, one parity block per output pixel
    (di, dj) in {0,1}^2.

    For parity di the 3-tap window over the upsampled rows collapses onto
    a 2-tap window over the original rows with partial-sum taps
    (di=0: {offset -1: W[0], offset 0: W[1]+W[2]};
     di=1: {offset 0: W[0]+W[1], offset +1: W[2]}), columns identically,
    so conv3x3(up2x(x), W) == depth_to_space(conv3x3(x, W4), 2) exactly
    (incl. the zero-padded borders — parity-asserted by
    tools/bench_subpixel_up.py and tests/test_subpixel_up.py).
    """
    row_groups = {0: [(0, [0]), (1, [1, 2])], 1: [(1, [0, 1]), (2, [2])]}
    blocks = []
    for di in (0, 1):
        for dj in (0, 1):
            K = jnp.zeros_like(W)
            for ri, taps_r in row_groups[di]:
                for ci, taps_c in row_groups[dj]:
                    s = sum(W[ky, kx] for ky in taps_r for kx in taps_c)
                    K = K.at[ri, ci].add(s)
            blocks.append(K)
    return jnp.concatenate(blocks, axis=-1)


class _SubpixelUpConv3x3(nn.Module):
    """``conv3x3(up2x(x))`` with the upsample folded into the weights
    (exact rewrite — see fold_up2x_kernel). Reads ``x`` once instead of
    the 4x-materialized nearest-upsample copy, and the weight-gradient
    conv contracts over the SMALL spatial grid with 4x output channels —
    much better MXU geometry than the C-underfilled dW convs the profile
    flagged at 128/256px (PERF.md, 3-stage profile). The parameter
    ('kernel', (3,3,C,F), orthogonal init, same scope path) is
    byte-identical to the nn.Conv it replaces, so checkpoints and init
    RNG streams are unchanged.
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param('kernel', orthogonal_init,
                            (3, 3, c, self.features), jnp.float32)
        w4 = fold_up2x_kernel(kernel).astype(self.dtype)
        y4 = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w4, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        b, h, w, _ = y4.shape
        f = self.features
        y = y4.reshape(b, h, w, 2, 2, f).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, f)


class _PallasDWConv3x3(nn.Module):
    """3x3 conv whose weight gradient runs in the Pallas streaming-dW
    kernel (ops/conv_dw.py; forward and dx are the identical XLA convs).
    The parameter ('kernel', (3,3,C,F), orthogonal init, same scope
    path) is byte-identical to the nn.Conv it replaces."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param('kernel', orthogonal_init,
                            (3, 3, c, self.features), jnp.float32)
        return conv_dw.conv3x3_dw(x.astype(self.dtype), kernel)


class Conv3x3(nn.Module):
    """3x3 stride-1 pad-1 bias-free conv (reference: model.py:79-82).

    ``c_vec`` switches to the joint-conv form: the conv runs over
    ``concat(tile(c_vec, HxW), x)`` channel-wise (condition first, as the
    reference concatenates) via the tile-free exact rewrite above.
    ``fold_up2x`` computes ``conv3x3(up2x(x))`` with the upsample folded
    into the weights (caller must NOT pre-upsample).
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    fold_up2x: bool = False

    @nn.compact
    def __call__(self, x, c_vec=None):
        if self.fold_up2x:
            assert c_vec is None, 'fold_up2x and joint-conv are exclusive'
            y = _SubpixelUpConv3x3(self.features, dtype=self.dtype,
                                   name='Conv_0')(x)
        elif c_vec is not None:
            y = _JointConv3x3(self.features, dtype=self.dtype,
                              name='Conv_0')(x, c_vec)
        elif PALLAS_DW and conv_dw.dw_supported(
                x.shape[1], x.shape[2], x.shape[-1], self.features):
            y = _PallasDWConv3x3(self.features, dtype=self.dtype,
                                 name='Conv_0')(x)
        else:
            y = nn.Conv(
                self.features, (3, 3), strides=1, padding=1, use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=orthogonal_init,
                name='Conv_0',
            )(x)
        # No-op tag: under TPU_REMAT_G='conv' the step's remat policy
        # saves exactly these outputs and recomputes the BN/GLU chains
        # between them in the backward (train/step.py).
        return checkpoint_name(y, 'conv')


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
        # The reference's weights_init orthogonalizes conv WEIGHTS only;
        # conv biases keep torch Conv2d's default U(-sqrt(k), sqrt(k)),
        # k = 1/(C_in*kh*kw) — the D logit heads are the only biased
        # convs, so match that distribution rather than zeros.
        bound = float(np.sqrt(1.0 / (x.shape[-1] * 16)))

        def torch_bias(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Conv(
            self.features, (4, 4), strides=4, padding=0, use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=orthogonal_init,
            bias_init=torch_bias,
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
        # SUBPIXEL_UP folds the upsample into the conv weights (exact
        # rewrite, identical parameters). Train-mode only: the fwd+bwd
        # pair wins (the dW/dx convs run at the small grid with 4x
        # channels) while a forward alone pays the depth-to-space
        # relayout without the backward savings (PERF.md).
        fold = SUBPIXEL_UP and train
        if not fold:
            x = upsample_nearest_2x(x)
        x = Conv3x3(self.features * 2, dtype=self.dtype,
                    fold_up2x=fold)(x)
        return bn_glu(x, train, self.dtype)


class Block3x3Relu(nn.Module):
    """conv3x3(2*out) -> BN -> GLU, keeps spatial size (model.py:98-104).

    With ``c_vec`` the conv is the joint form over
    ``concat(tile(c_vec), x)`` (see Conv3x3).
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True, c_vec=None):
        x = Conv3x3(self.features * 2, dtype=self.dtype)(x, c_vec=c_vec)
        return bn_glu(x, train, self.dtype)


class ResBlock(nn.Module):
    """conv-BN-GLU-conv-BN + skip (model.py:107-123)."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out = Conv3x3(self.features * 2, dtype=self.dtype)(x)
        out = bn_glu(out, train, self.dtype, name='BatchNorm_0')
        out = Conv3x3(self.features, dtype=self.dtype)(out)
        out = BatchNorm(use_running_average=not train,
                        name='BatchNorm_1')(out)
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
