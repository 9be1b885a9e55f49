"""Multi-scale discriminators, TPU-native.

Re-designs the reference discriminator family (model.py:853-1373) as Flax
modules in NHWC layout:

  * DNet        — D_NET64/128/256/512/1024 (model.py:874, 1006, 1154, 1261,
                  1317) folded into one module parameterized by image size;
                  match head + optional unconditional head.
  * JointDNet   — JOINT_D_NET64/128 (+256) (model.py:918, 1054, 1206): three
                  heads — sentence match (conditional), reality
                  (unconditional), and an (ENTITY_DIM+1)-way class head,
                  optionally a capsule classifier treating the 4x4 spatial
                  map as 16 capsules of length 8*ndf (model.py:966-971).
  * EntityDNet  — ENTITY_D_NET64/128/256 (model.py:853, 980, 1124): legacy
                  two-head design (reality scalar + class log-probs).

Heads return probabilities/log-probabilities exactly as the reference does
(sigmoid on the match/reality conv heads, log_softmax on the class head) so
the loss layer can mirror BCELoss/soft-CE semantics; the loss layer computes
these in float32.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import (
    Block3x3LeakyRelu, Conv4x4s4, Dense, DownBlock, EncodeBy16)
from ..ops.capsule import CapsuleLinear

Dtype = Any


class _DownTower(nn.Module):
    """encode16x plus the extra downsampling pyramid for sizes > 64
    (model.py:1016-1018, 1164-1168, 1271-1277, 1327-1335)."""

    ndf: int
    imsize: int  # 64, 128, 256, 512, or 1024
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        ndf = self.ndf
        self.encode16 = EncodeBy16(ndf, dtype=self.dtype)
        downs, squeezes = [], []
        # Each factor of 2 beyond 64 adds one stride-2 downBlock doubling
        # channels; then 3x3 blocks squeeze channels back to 8*ndf.
        extra = {64: 0, 128: 1, 256: 2, 512: 3, 1024: 4}[self.imsize]
        ch = ndf * 8
        for _ in range(extra):
            ch *= 2
            downs.append(DownBlock(ch, dtype=self.dtype))
        while ch > ndf * 8:
            ch //= 2
            squeezes.append(Block3x3LeakyRelu(ch, dtype=self.dtype))
        self.downs = downs
        self.squeezes = squeezes

    def __call__(self, x, train: bool = True):
        x = self.encode16(x, train)
        for blk in self.downs:
            x = blk(x, train)
        for blk in self.squeezes:
            x = blk(x, train)
        return x  # [B, 4, 4, 8*ndf]


class DNet(nn.Module):
    """Per-scale discriminator with match head and optional uncond head."""

    ndf: int = 64
    ef_dim: int = 128
    imsize: int = 64
    b_condition: bool = True
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.tower = _DownTower(self.ndf, self.imsize, dtype=self.dtype)
        self.logits = Conv4x4s4(1, dtype=self.dtype)
        if self.b_condition:
            self.jointConv = Block3x3LeakyRelu(self.ndf * 8, dtype=self.dtype)
            self.uncond_logits = Conv4x4s4(1, dtype=self.dtype)

    def __call__(self, x, c_code=None, train: bool = True):
        if c_code is not None and c_code.shape[-1] != self.ef_dim:
            raise ValueError(
                'condition code width %d != ef_dim %d this DNet was '
                'built for' % (c_code.shape[-1], self.ef_dim))
        x_code = self.tower(x, train)
        if self.b_condition and c_code is not None:
            h = _concat_cond(x_code, c_code)
            h = self.jointConv(h, train)
        else:
            h = x_code
        out = jax.nn.sigmoid(self.logits(h).astype(jnp.float32)).reshape(-1)
        if self.b_condition:
            unc = jax.nn.sigmoid(
                self.uncond_logits(x_code).astype(jnp.float32)).reshape(-1)
            return [out, unc]
        return [out]


class JointDNet(nn.Module):
    """Three-headed joint discriminator (model.py:918-977, 1054-1121)."""

    ndf: int = 64
    ef_dim: int = 256  # EMBEDDING_DIM*2 under CAT_Z='concat' (model.py:922-924)
    entity_dim: int = 200
    imsize: int = 64
    use_cap: bool = False
    num_iterations: int = 3
    routing: str = 'dynamic'
    use_pallas: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.tower = _DownTower(self.ndf, self.imsize, dtype=self.dtype)
        self.jointConv = Block3x3LeakyRelu(self.ndf * 8, dtype=self.dtype)
        self.logits = Conv4x4s4(1, dtype=self.dtype)
        self.uncond_logits = Conv4x4s4(1, dtype=self.dtype)
        if self.use_cap:
            self.fc_ac_cap = CapsuleLinear(
                out_capsules=self.entity_dim + 1, in_length=self.ndf * 8,
                out_length=16, num_iterations=self.num_iterations,
                routing=self.routing, use_pallas=self.use_pallas)
        else:
            self.fc_ac = Dense(self.entity_dim + 1, dtype=self.dtype)

    def __call__(self, x, c_code, train: bool = True):
        if c_code.shape[-1] != self.ef_dim:
            # enforce the documented contract instead of leaving the
            # joint conv to lazily shape itself around a wrong width and
            # fail obscurely (or not at all) later
            raise ValueError(
                'condition code width %d != ef_dim %d this JointDNet was '
                'built for' % (c_code.shape[-1], self.ef_dim))
        x_code = self.tower(x, train)                 # [B, 4, 4, 8ndf]
        h = _concat_cond(x_code, c_code)
        h = self.jointConv(h, train)
        sen_match = jax.nn.sigmoid(
            self.logits(h).astype(jnp.float32)).reshape(-1)
        real = jax.nn.sigmoid(
            self.uncond_logits(x_code).astype(jnp.float32)).reshape(-1)

        b = x_code.shape[0]
        if self.use_cap:
            # NHWC spatial positions are the 16 input capsules of length
            # 8*ndf (the reference permutes NCHW to put depth last,
            # model.py:967-968 — NHWC already has that layout).
            caps = x_code.reshape(b, 16, self.ndf * 8)
            out = self.fc_ac_cap(caps)                # [B, entity+1, 16]
            norm = jnp.sqrt(jnp.sum(jnp.square(out), axis=-1) + 1e-12)
            cp = jax.nn.log_softmax(norm.astype(jnp.float32), axis=-1)
        else:
            # The reference flattens NCHW as [8ndf, 4, 4]; fc over the
            # flattened code. Flatten order differs in NHWC but the layer is
            # fully-connected so the distribution over functions is
            # identical for a fresh build.
            flat = x_code.reshape(b, -1)
            cp = jax.nn.log_softmax(
                self.fc_ac(flat).astype(jnp.float32), axis=-1)
        return [sen_match, real, cp]


class EntityDNet(nn.Module):
    """Legacy entity discriminator (model.py:853-870, 980-1002, 1124-1150)."""

    ndf: int = 64
    entity_dim: int = 200
    imsize: int = 64
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.tower = _DownTower(self.ndf, self.imsize, dtype=self.dtype)
        self.fc_real = Dense(1, dtype=self.dtype)
        self.fc_ac = Dense(self.entity_dim + 1, dtype=self.dtype)

    def __call__(self, x, train: bool = True):
        x_code = self.tower(x, train)
        flat = x_code.reshape(x_code.shape[0], -1)
        tp = self.fc_real(flat).astype(jnp.float32)[:, 0]
        cp = jax.nn.log_softmax(self.fc_ac(flat).astype(jnp.float32), axis=-1)
        return tp, cp


def _concat_cond(x_code, c_code):
    """Tile the condition code over the 4x4 map and concat on channels
    (model.py:956-959)."""
    b = x_code.shape[0]
    c = jnp.broadcast_to(
        c_code[:, None, None, :].astype(x_code.dtype),
        (b, 4, 4, c_code.shape[-1]))
    return jnp.concatenate([c, x_code], axis=-1)


def build_discriminators(cfg, cond_width: Optional[int] = None) -> List[nn.Module]:
    """One JointDNet per branch, as the trainers build them
    (cub_trainer_splitz_cap_ca.py:142-158; trainer.py:122-137).

    ``cond_width`` is the actual width of the condition code the trainer
    feeds (cat of mus under CAT_Z='concat'); defaults to the reference's
    ef_dim formula (model.py:922-924).
    """
    dtype = jnp.bfloat16 if cfg.TPU_COMPUTE_DTYPE == 'bfloat16' \
        else jnp.float32
    from .generator import _apply_bn_dtype_policy
    _apply_bn_dtype_policy(cfg)
    if cond_width is None:
        cond_width = cfg.GAN.EMBEDDING_DIM * 2 if cfg.TRAIN.CAT_Z == 'concat' \
            else cfg.GAN.EMBEDDING_DIM
    common = dict(
        ndf=cfg.GAN.DF_DIM, ef_dim=cond_width, entity_dim=cfg.GAN.ENTITY_DIM,
        use_cap=cfg.TRAIN.D_CAPSULE,
        num_iterations=cfg.TPU_CAPSULE_ITERATIONS,
        routing=cfg.TPU_CAPSULE_ROUTING, use_pallas=cfg.TPU_CAPSULE_PALLAS,
        dtype=dtype)
    nets = []
    sizes = cfg.branch_sizes()
    if cfg.TREE.BRANCH_NUM > 0:
        nets.append(JointDNet(imsize=sizes[0], **common))
    if cfg.TREE.BRANCH_NUM > 1:
        nets.append(JointDNet(imsize=sizes[1], **common))
    if cfg.TREE.BRANCH_NUM > 2:
        nets.append(JointDNet(imsize=sizes[2], **common))
    return nets
