"""Multi-stage generators, TPU-native.

Re-designs the reference generator family (model.py:204-808) as Flax modules
in NHWC layout:

  * InitStageG / CondInitStageG         (model.py:336-376 / 204-235)
  * CondInitStageGWithCap               (model.py:238-277, capsule first FC)
  * CondInitStageGExchangeCap           (model.py:280-333, two capsule branches)
  * NextStageG                          (model.py:379-423)
  * ToRGB                               (model.py:426-437, GET_IMAGE_G)
  * GNet / CondGNet / CondGNetCatZ / CondGNetCatZCA
                                        (model.py:747 / 669 / 567 / 455)

Assemblies return the per-stage hidden codes; ``image``/``get_image`` decode
them through the toRGB heads exactly as the reference splits forward/image
(model.py:509-563). toRGB heads are owned by the assembly; the reference's
cross-instance head sharing (get_shareGs, model.py:439-451) is only relevant
when several generator instances coexist, which the TPU trainers never need.

FC-to-4x4 reshapes keep the reference's NCHW channel-major element order and
transpose to NHWC afterwards, so the math is identical despite the layout.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn import blocks
from ..nn.blocks import (
    BatchNorm, Block3x3Relu, Conv3x3, Dense, ResBlock, UpBlock, glu)
from ..nn.conditioning import CANet, VCNet
from ..ops.capsule import CapsuleLinear

Dtype = Any


def _to_nhwc_4x4(x_flat: jnp.ndarray, channels: int) -> jnp.ndarray:
    """[B, channels*16] (NCHW-flat order) -> [B, 4, 4, channels]."""
    b = x_flat.shape[0]
    return x_flat.reshape(b, channels, 4, 4).transpose(0, 2, 3, 1)


class _UpStack(nn.Module):
    """The four ngf -> ngf/16 up-sampling blocks every init stage shares
    (model.py:217-220)."""

    ngf: int
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.upsample1 = UpBlock(self.ngf // 2, dtype=self.dtype)
        self.upsample2 = UpBlock(self.ngf // 4, dtype=self.dtype)
        self.upsample3 = UpBlock(self.ngf // 8, dtype=self.dtype)
        self.upsample4 = UpBlock(self.ngf // 16, dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        x = self.upsample1(x, train)
        x = self.upsample2(x, train)
        x = self.upsample3(x, train)
        return self.upsample4(x, train)


class InitStageG(nn.Module):
    """FC -> BN -> GLU -> 4x4 x ngf -> 4 upBlocks -> 64px (model.py:336-376)."""

    ngf: int
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.fc = Dense(self.ngf * 4 * 4 * 2, use_bias=False, dtype=self.dtype)
        self.bn = BatchNorm()
        self.up = _UpStack(self.ngf, dtype=self.dtype)

    def __call__(self, z_code, c_code=None, train: bool = True):
        in_code = z_code if c_code is None else jnp.concatenate(
            [c_code, z_code], axis=1)
        x = self.fc(in_code.astype(self.dtype))
        x = self.bn(x, use_running_average=not train)
        x = glu(x).astype(self.dtype)
        x = _to_nhwc_4x4(x, self.ngf)
        return self.up(x, train)


class CondInitStageG(nn.Module):
    """Same tower over the fused condition code (model.py:204-235)."""

    ngf: int
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.fc = Dense(self.ngf * 4 * 4 * 2, use_bias=False, dtype=self.dtype)
        self.bn = BatchNorm()
        self.up = _UpStack(self.ngf, dtype=self.dtype)

    def __call__(self, ac_x, noise=None, train: bool = True):
        if noise is not None:
            ac_x = jnp.concatenate([ac_x, noise], axis=1)
        x = self.fc(ac_x.astype(self.dtype))
        x = self.bn(x, use_running_average=not train)
        x = glu(x).astype(self.dtype)
        x = _to_nhwc_4x4(x, self.ngf)
        return self.up(x, train)


class CondInitStageGWithCap(nn.Module):
    """Capsule first stage (model.py:238-277).

    The latent is reshaped into length-8 capsules, routed to ngf output
    capsules of length 32 (=4*4*2), flattened back (channel-major), then
    BN + GLU as in the plain FC stage.
    """

    ngf: int
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.fc_cap = CapsuleLinear(
            out_capsules=self.ngf, in_length=8, out_length=4 * 4 * 2,
            num_iterations=self.num_iterations, routing=self.routing,
            use_pallas=self.use_pallas)
        self.bn = BatchNorm()
        self.up = _UpStack(self.ngf, dtype=self.dtype)

    def __call__(self, z, noise=None, train: bool = True):
        if noise is not None:  # CA variant concatenates the raw noise
            z = jnp.concatenate([z, noise], axis=1)
        b = z.shape[0]
        # The latent must factor into length-8 capsules. Configs pick Z_DIM
        # so it does (e.g. Z_DIM=128 'for concat', the flagship yml); for
        # widths that don't divide (CAT_Z=product/sum with Z_DIM=100) the
        # reference's view() would crash — zero-pad instead: zero capsules
        # emit zero votes and are routing no-ops.
        pad = (-z.shape[1]) % 8
        if pad:
            z = jnp.pad(z, ((0, 0), (0, pad)))
        caps_in = z.reshape(b, -1, 8)
        out = self.fc_cap(caps_in)                      # [B, ngf, 32]
        x = out.reshape(b, self.ngf * 4 * 4 * 2)        # channel-major flat
        x = self.bn(x, use_running_average=not train)
        x = glu(x).astype(self.dtype)
        x = _to_nhwc_4x4(x, self.ngf)
        return self.up(x, train)


class CondInitStageGExchangeCap(nn.Module):
    """Two capsule branches over split z, fused at 4x4 (model.py:280-333).

    Each branch routes its half of the latent into (ngf/2)*2 capsules of
    length 16, GLU-gates to ngf/2 channels, and the two 4x4 maps concatenate
    on channels before the shared up-stack.
    """

    ngf: int
    in_dim: int  # size of the first (sentence) half of z
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        half = self.ngf // 2
        kw = dict(out_capsules=half * 2, in_length=8, out_length=4 * 4,
                  num_iterations=self.num_iterations, routing=self.routing,
                  use_pallas=self.use_pallas)
        self.fc_cap = CapsuleLinear(**kw)
        self.fc_cap1 = CapsuleLinear(**kw)
        self.bn_s = BatchNorm()
        self.bn_c = BatchNorm()
        self.up = _UpStack(self.ngf, dtype=self.dtype)

    def _branch(self, z_half, cap, bn, train):
        b = z_half.shape[0]
        half = self.ngf // 2
        # same zero-pad guard as CondInitStageGWithCap: the class half is
        # MANIFD_DIM + Z_DIM wide when noise is concatenated, which need
        # not divide into length-8 capsules (e.g. Z_DIM=100 with
        # EXCHANGE); zero capsules emit zero votes and are routing no-ops
        pad = (-z_half.shape[1]) % 8
        if pad:
            z_half = jnp.pad(z_half, ((0, 0), (0, pad)))
        out = cap(z_half.reshape(b, -1, 8))             # [B, ngf, 16]
        x = out.reshape(b, half * 4 * 4 * 2)
        x = bn(x, use_running_average=not train)
        x = glu(x).astype(self.dtype)
        return _to_nhwc_4x4(x, half)

    def __call__(self, z, noise=None, train: bool = True):
        zs, zc = z[:, :self.in_dim], z[:, self.in_dim:]
        xs = self._branch(zs, self.fc_cap, self.bn_s, train)
        xc = self._branch(zc, self.fc_cap1, self.bn_c, train)
        x = jnp.concatenate([xs, xc], axis=-1)
        return self.up(x, train)


class NextStageG(nn.Module):
    """Tile condition over HxW, joint conv, resblocks, upsample
    (model.py:379-423)."""

    ngf: int
    ef_dim: int
    num_residual: int = 2
    scale: int = 2
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.jointConv = Block3x3Relu(self.ngf, dtype=self.dtype)
        self.residual = [ResBlock(self.ngf, dtype=self.dtype)
                         for _ in range(self.num_residual)]
        self.upsample = UpBlock(self.ngf // 2, dtype=self.dtype)
        if self.scale == 4:
            self.upsample2 = UpBlock(self.ngf // 4, dtype=self.dtype)

    def __call__(self, h_code, c_code, train: bool = True):
        if blocks.SPLIT_JOINT_CONV:
            # Tile-free exact rewrite of conv(concat(tiled c, h)) — the
            # concat form is the hottest op pair in the flagship step
            # (PERF.md); parameters are identical either way.
            x = self.jointConv(h_code, train, c_vec=c_code)
        else:
            b, s, _, _ = h_code.shape
            c = jnp.broadcast_to(
                c_code[:, None, None, :].astype(h_code.dtype),
                (b, s, s, c_code.shape[-1]))
            x = jnp.concatenate([c, h_code], axis=-1)
            x = self.jointConv(x, train)
        for block in self.residual:
            x = block(x, train)
        x = self.upsample(x, train)
        if self.scale == 4:
            x = self.upsample2(x, train)
        return x


class ToRGB(nn.Module):
    """conv3x3 -> tanh decoder head (model.py:426-437)."""

    ngf: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, h_code):
        x = Conv3x3(3, dtype=self.dtype)(h_code)
        return jnp.tanh(x.astype(jnp.float32))


class _StagesMixin:
    """Shared stage wiring + image decoding for all assemblies."""

    def _make_stages(self, gf_dim, ef_dim, branch_num, r_num, scale, dtype,
                     init_stage):
        self.h_net1 = init_stage
        self.img_net1 = ToRGB(gf_dim, dtype=dtype)
        if branch_num > 1:
            self.h_net2 = NextStageG(gf_dim, ef_dim, num_residual=r_num,
                                     scale=scale, dtype=dtype)
            self.img_net2 = ToRGB(gf_dim // scale, dtype=dtype)
        if branch_num > 2:
            self.h_net3 = NextStageG(gf_dim // scale, ef_dim,
                                     num_residual=r_num, scale=scale,
                                     dtype=dtype)
            self.img_net3 = ToRGB(gf_dim // scale ** 2, dtype=dtype)

    def _run_stages(self, h1, c_code, train):
        h_codes = [h1]
        if self.branch_num > 1:
            h_codes.append(self.h_net2(h_codes[-1], c_code, train))
        if self.branch_num > 2:
            h_codes.append(self.h_net3(h_codes[-1], c_code, train))
        return h_codes

    def image(self, hcodes: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        """Decode hidden codes to images (model.py:547-563)."""
        heads = [self.img_net1]
        if self.branch_num > 1:
            heads.append(self.img_net2)
        if self.branch_num > 2:
            heads.append(self.img_net3)
        return [head(h) for head, h in zip(heads, hcodes)]

    def get_image(self, entity_hcodes, sen_hcodes) -> List[jnp.ndarray]:
        """Two-path decode: element-wise product of h-codes (model.py:529-545)."""
        prods = [e * s for e, s in zip(entity_hcodes, sen_hcodes)]
        return self.image(prods)

    def init_all(self, *args, **kwargs):
        """Forward + decode in one trace so ``init`` creates every param
        (the toRGB heads are only reached through ``image``)."""
        out = self.__call__(*args, **kwargs)
        imgs = self.image(out[0])
        return out, imgs


class GNet(nn.Module, _StagesMixin):
    """Vanilla StackGAN++ generator with optional CA (model.py:747-808)."""

    gf_dim: int = 64
    ef_dim: int = 128
    z_dim: int = 100
    text_dim: int = 1024
    branch_num: int = 3
    r_num: int = 2
    scale: int = 2
    b_condition: bool = True
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        if self.b_condition:
            self.ca_net = CANet(ef_dim=self.ef_dim, dtype=self.dtype)
        cond_ef = self.ef_dim if self.b_condition else self.z_dim
        self._make_stages(self.gf_dim, cond_ef, self.branch_num, self.r_num,
                          self.scale, self.dtype,
                          InitStageG(self.gf_dim * 16, dtype=self.dtype))

    def __call__(self, z_code, text_embedding=None, train: bool = True):
        if self.b_condition and text_embedding is not None:
            c_code, mu, logvar, _ = self.ca_net(text_embedding, train)
        else:
            c_code, mu, logvar = z_code, None, None
        h1 = self.h_net1(z_code, c_code if self.b_condition else None, train)
        return self._run_stages(h1, c_code, train), mu, logvar


class CondGNet(nn.Module, _StagesMixin):
    """Single-VC_NET conditional generator (model.py:669-744)."""

    cond_dim: int
    gf_dim: int = 64
    ef_dim: int = 128
    manifd_dim: int = 128
    branch_num: int = 2
    r_num: int = 2
    scale: int = 2
    use_cap: bool = False
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.vc_net = VCNet(manifd_dim=self.manifd_dim, dtype=self.dtype)
        ngf = self.gf_dim * 16
        if self.use_cap:
            init = CondInitStageGWithCap(
                ngf, num_iterations=self.num_iterations, routing=self.routing,
                use_pallas=self.use_pallas, dtype=self.dtype)
        else:
            init = CondInitStageG(ngf, dtype=self.dtype)
        # NEXT_STAGE_G sees ef_dim-wide condition here (single VC code of
        # MANIFD_DIM == EMBEDDING_DIM in every reference config).
        self._make_stages(self.gf_dim, self.manifd_dim, self.branch_num,
                          self.r_num, self.scale, self.dtype, init)

    def __call__(self, noise, cond, train: bool = True):
        c_code, mu, logvar, std = self.vc_net(noise, cond, train)
        h1 = self.h_net1(c_code, train=train)
        return self._run_stages(h1, c_code, train), mu, logvar, std


class CondGNetCatZ(nn.Module, _StagesMixin):
    """Split-z generator: VC(sen) + VC(cls) (model.py:567-665)."""

    sen_dim: int
    cls_dim: int
    gf_dim: int = 64
    manifd_dim: int = 128
    branch_num: int = 2
    r_num: int = 2
    scale: int = 2
    use_cap: bool = False
    cat: str = 'concat'
    exchange: bool = False
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.vc_net1 = VCNet(manifd_dim=self.manifd_dim, dtype=self.dtype)
        self.vc_net2 = VCNet(manifd_dim=self.manifd_dim, dtype=self.dtype)
        ef = self.manifd_dim * 2 if self.cat == 'concat' else self.manifd_dim
        self._make_stages(self.gf_dim, ef, self.branch_num, self.r_num,
                          self.scale, self.dtype,
                          _make_init_stage(self))

    def __call__(self, noise, sen, cls, train: bool = True):
        c1, mu1, logvar1, std1 = self.vc_net1(noise, sen, train)
        c2, mu2, logvar2, std2 = self.vc_net2(noise, cls, train)
        c_code = _fuse(c1, c2, self.cat, self.exchange)
        h1 = self.h_net1(c_code, train=train)
        h_codes = self._run_stages(h1, c_code, train)
        return h_codes, mu1, mu2, logvar1, logvar2, std1, std2


class CondGNetCatZCA(nn.Module, _StagesMixin):
    """Flagship split-z generator: CA for the sentence path, VC for the class
    path (model.py:455-563).

    At eval time with ``cls_prior`` semantics (model.py:485-494) the class
    code is replaced by an externally supplied prior or a standard normal
    draw from the 'cls_prior' RNG stream.

    Note: the reference wiring passes (c_code, noise) into the init stage
    (model.py:512) which only type-checks for the capsule variant; here every
    init stage accepts the optional noise concat, so use_cap=False works too.
    """

    sen_dim: int
    cls_dim: int
    gf_dim: int = 64
    ef_dim: int = 128
    manifd_dim: int = 128
    branch_num: int = 2
    r_num: int = 2
    scale: int = 2
    use_cap: bool = False
    cat: str = 'concat'
    exchange: bool = False
    use_cls_prior: bool = False  # cfg.TEST.CLS_PRIOR
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.ca_net1 = CANet(ef_dim=self.ef_dim, dtype=self.dtype)
        self.vc_net2 = VCNet(manifd_dim=self.manifd_dim, dtype=self.dtype)
        ef = self.ef_dim + self.manifd_dim if self.cat == 'concat' \
            else self.ef_dim
        self._make_stages(self.gf_dim, ef, self.branch_num, self.r_num,
                          self.scale, self.dtype,
                          _make_init_stage(self))

    def __call__(self, noise, sen, cls=None, cls_prior=None,
                 train: bool = True):
        c1, mu1, logvar1, std1 = self.ca_net1(sen, train)
        if train or not self.use_cls_prior:
            c2, mu2, logvar2, std2 = self.vc_net2(noise, cls, train)
        else:
            if cls_prior is None:
                cls_prior = jax.random.normal(
                    self.make_rng('cls_prior'),
                    (noise.shape[0], self.manifd_dim), jnp.float32)
            c2 = cls_prior
            mu2 = logvar2 = std2 = jnp.zeros_like(c2)
        c_code = _fuse(c1, c2, self.cat, self.exchange)
        h1 = self.h_net1(c_code, noise, train=train)
        h_codes = self._run_stages(h1, c_code, train)
        return h_codes, mu1, mu2, logvar1, logvar2, std1, std2


def _fuse(c1, c2, cat: str, exchange: bool):
    """Latent fusion (model.py:497-508)."""
    if exchange or cat == 'concat':
        return jnp.concatenate([c1, c2], axis=1)
    if cat == 'product':
        return c1 * c2
    if cat == 'sum':
        return c1 + c2
    raise ValueError('unknown CAT_Z: %s' % cat)


def _make_init_stage(m) -> nn.Module:
    """Build the stage-1 tower for a split-z assembly from its flags."""
    ngf = m.gf_dim * 16
    if m.use_cap:
        if m.exchange:
            # the sentence half width: CA path is ef_dim wide for the CA
            # assembly, manifd_dim for the VC one
            sen_w = getattr(m, 'ef_dim', m.manifd_dim)
            return CondInitStageGExchangeCap(
                ngf, in_dim=sen_w, num_iterations=m.num_iterations,
                routing=m.routing, use_pallas=m.use_pallas, dtype=m.dtype)
        return CondInitStageGWithCap(
            ngf, num_iterations=m.num_iterations, routing=m.routing,
            use_pallas=m.use_pallas, dtype=m.dtype)
    return CondInitStageG(ngf, dtype=m.dtype)


def _apply_bn_dtype_policy(cfg) -> None:
    """Set the module-level block policies from config (must run before
    model construction/tracing): BatchNorm compute dtype and the joint-conv
    formulation."""
    from ..nn import blocks
    blocks.BN_DTYPE = jnp.bfloat16 \
        if getattr(cfg, 'TPU_BN_DTYPE', 'float32') == 'bfloat16' \
        else jnp.float32
    blocks.SPLIT_JOINT_CONV = bool(
        getattr(cfg, 'TPU_SPLIT_JOINTCONV', True))
    blocks.FUSED_BN_GLU = bool(
        getattr(cfg, 'TPU_FUSED_BN_GLU', False))
    blocks.SUBPIXEL_UP = bool(
        getattr(cfg, 'TPU_SUBPIXEL_UP', False))
    blocks.PALLAS_DW = bool(
        getattr(cfg, 'TPU_PALLAS_DW', False))


def build_generator(cfg, train_flag: bool = True) -> nn.Module:
    """Instantiate the generator the trainers use for a given config.

    Mirrors load_network's selection (cub_trainer_splitz_cap_ca.py:113-135,
    trainer.py:107-135): the CUB split-z trainers build CondGNetCatZCA; the
    COCO/concat trainer builds CondGNet over cat(txt, cls); the
    unconditional/legacy path builds GNet.
    """
    dtype = jnp.bfloat16 if cfg.TPU_COMPUTE_DTYPE == 'bfloat16' \
        else jnp.float32
    _apply_bn_dtype_policy(cfg)
    use_cap = cfg.TRAIN.G_CAPSULE if train_flag else cfg.TEST.G_CAPSULE
    common = dict(
        gf_dim=cfg.GAN.GF_DIM,
        branch_num=cfg.TREE.BRANCH_NUM,
        r_num=cfg.GAN.R_NUM,
        scale=cfg.TREE.SCALE,
        dtype=dtype,
    )
    if not cfg.GAN.B_CONDITION:
        return GNet(ef_dim=cfg.GAN.EMBEDDING_DIM, z_dim=cfg.GAN.Z_DIM,
                    text_dim=cfg.TEXT.DIMENSION, b_condition=False, **common)
    if cfg.DATASET_NAME == 'coco':
        return CondGNet(
            cond_dim=cfg.GAN.ENTITY_DIM + 1 + cfg.TEXT.DIMENSION,
            ef_dim=cfg.GAN.EMBEDDING_DIM, manifd_dim=cfg.GAN.MANIFD_DIM,
            use_cap=use_cap, num_iterations=cfg.TPU_CAPSULE_ITERATIONS,
            routing=cfg.TPU_CAPSULE_ROUTING, use_pallas=cfg.TPU_CAPSULE_PALLAS,
            **common)
    return CondGNetCatZCA(
        sen_dim=cfg.TEXT.DIMENSION, cls_dim=cfg.GAN.ENTITY_DIM,
        ef_dim=cfg.GAN.EMBEDDING_DIM, manifd_dim=cfg.GAN.MANIFD_DIM,
        use_cap=use_cap, cat=cfg.TRAIN.CAT_Z, exchange=cfg.TRAIN.EXCHANGE,
        use_cls_prior=cfg.TEST.CLS_PRIOR,
        num_iterations=cfg.TPU_CAPSULE_ITERATIONS,
        routing=cfg.TPU_CAPSULE_ROUTING, use_pallas=cfg.TPU_CAPSULE_PALLAS,
        **common)
