"""Legacy two-path sampling (reference: trainer.py:711-838).

The reference's COCO-era evaluate loads TWO generators — an unconditional/
CA sentence generator (G_NET from TRAIN.NET_G) and an entity generator
(COND_G_NET over the class one-hot, from TRAIN.ENTITY_NET_G) — runs both on
the SAME noise, and decodes the element-wise product of their hidden codes
through the shared toRGB heads (netG.module.get_image, trainer.py:822-824).

Here both assemblies are flax modules; the decode goes through the sentence
generator's heads (the reference's shareGs are the same object for both
nets, so this is the identical computation). Checkpoints are orbax trees of
{'params', 'batch_stats'} per net.
"""

from __future__ import annotations

import itertools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..io_utils import save_single_images
from ..io_utils.images import flush_writes, save_super_images
from ..models.generator import CondGNet, GNet


def build_two_path_nets(cfg):
    dtype = jnp.bfloat16 if cfg.TPU_COMPUTE_DTYPE == 'bfloat16' \
        else jnp.float32
    common = dict(gf_dim=cfg.GAN.GF_DIM, branch_num=cfg.TREE.BRANCH_NUM,
                  r_num=cfg.GAN.R_NUM, scale=cfg.TREE.SCALE, dtype=dtype)
    sen_net = GNet(ef_dim=cfg.GAN.EMBEDDING_DIM, z_dim=cfg.GAN.Z_DIM,
                   text_dim=cfg.TEXT.DIMENSION, b_condition=True, **common)
    entity_net = CondGNet(cond_dim=cfg.GAN.ENTITY_DIM,
                          ef_dim=cfg.GAN.EMBEDDING_DIM,
                          manifd_dim=cfg.GAN.MANIFD_DIM, **common)
    return sen_net, entity_net


def init_two_path_variables(cfg, rng):
    """Random-init variables for both nets (weights_init equivalent)."""
    import functools
    sen_net, entity_net = build_two_path_nets(cfg)
    bs = 2
    noise = jnp.zeros((bs, cfg.GAN.Z_DIM), jnp.float32)
    txt = jnp.zeros((bs, cfg.TEXT.DIMENSION), jnp.float32)
    cls = jnp.zeros((bs, cfg.GAN.ENTITY_DIM), jnp.float32)
    rngs = {'params': rng, 'reparam': rng, 'cls_prior': rng}
    sen_vars = jax.jit(functools.partial(
        sen_net.init, train=True, method='init_all'))(rngs, noise, txt)
    ent_vars = jax.jit(functools.partial(
        entity_net.init, train=True, method='init_all'))(rngs, noise, cls)
    return sen_net, entity_net, sen_vars, ent_vars


def two_path_sample(sen_net, entity_net, sen_vars, ent_vars, rng, noise,
                    txt_emb, cls_onehot, train_mode: bool = True):
    """Product-of-hcodes decode through the sentence net's heads."""
    k1, k2 = jax.random.split(rng)
    kw = dict(train=train_mode)
    if train_mode:
        sen_out, _ = sen_net.apply(sen_vars, noise, txt_emb,
                                   rngs={'reparam': k1},
                                   mutable=['batch_stats'], **kw)
        ent_out, _ = entity_net.apply(ent_vars, noise, cls_onehot,
                                      rngs={'reparam': k2},
                                      mutable=['batch_stats'], **kw)
    else:
        sen_out = sen_net.apply(sen_vars, noise, txt_emb,
                                rngs={'reparam': k1}, **kw)
        ent_out = entity_net.apply(ent_vars, noise, cls_onehot,
                                   rngs={'reparam': k2}, **kw)
    sen_hcodes, ent_hcodes = sen_out[0], ent_out[0]
    return sen_net.apply(sen_vars, ent_hcodes, sen_hcodes,
                         method='get_image')


def evaluate_two_path(cfg, data_loader, output_dir: str,
                      split_dir: str = 'test', sample_num: int = 3,
                      max_batches: Optional[int] = None):
    """Reference trainer.py:711-838 sampling loop: fresh noise per
    (caption, draw), product decode, train-mode BN (eval_mode=False there),
    super grids or single images."""
    if not cfg.TRAIN.NET_G:
        print('Error: the path for models is not found!')
        return None
    sen_net, entity_net, sen_vars, ent_vars = init_two_path_variables(
        cfg, jax.random.PRNGKey(0))
    from ..io_utils.checkpoint import restore_train_state
    sen_vars = restore_train_state(cfg.TRAIN.NET_G, sen_vars)
    if cfg.TRAIN.ENTITY_NET_G:
        ent_vars = restore_train_state(cfg.TRAIN.ENTITY_NET_G, ent_vars)

    sample = jax.jit(lambda sv, ev, rng, noise, txt, cls: tuple(
        two_path_sample(sen_net, entity_net, sv, ev, rng, noise, txt, cls)))

    save_dir = os.path.join(output_dir, 'eval', 'Testset_trainmode_twopath')
    embedding_dim = 10
    # Host-built keys + host noise, the trainer.evaluate pattern: an
    # eager jax.random.split/normal per (caption, draw) costs ~100 ms
    # each on the tunneled backend (PERF.md pitfall); the jitted sample
    # call transfers them with the other args.
    np_rng = np.random.default_rng(100)
    kseq = itertools.count()
    for step, data in enumerate(data_loader):
        if max_batches is not None and step >= max_batches:
            break
        embeddings = np.asarray(data['embeddings'], np.float32)
        cls = np.asarray(data['cls'])
        if cls.ndim > 1:
            # multi-hot labels (modern coco loader): take the first hot
            # class, already 0-based. The reference's two-path evaluate
            # predates multi-hot and got 1-based ints from its loader
            # (trainer.py:792-793).
            cls = cls[:, :cfg.GAN.ENTITY_DIM].argmax(1)
        else:
            cls = cls - 1
        cls_onehot = jnp.asarray(
            np.eye(cfg.GAN.ENTITY_DIM, dtype=np.float32)[cls])
        bsz = embeddings.shape[0]
        fake_img_list = []
        for i in range(min(embedding_dim, embeddings.shape[1])):
            for j in range(sample_num):
                k_s = np.array([200, next(kseq)], np.uint32)
                noise = np_rng.standard_normal(
                    (bsz, cfg.GAN.Z_DIM), dtype=np.float32)
                fakes = sample(sen_vars, ent_vars, k_s, noise,
                               jnp.asarray(embeddings[:, i, :]), cls_onehot)
                if cfg.TEST.B_EXAMPLE:
                    fake_img_list.append(np.asarray(fakes[-1]))
                else:
                    save_single_images(np.asarray(fakes[-1]), data['key'],
                                       save_dir, split_dir, i, cls,
                                       cfg.imsize, j)
        if cfg.TEST.B_EXAMPLE:
            save_super_images(fake_img_list, data['key'], save_dir,
                              split_dir, 256)
        print('[%d]' % step)
    errors = flush_writes()  # join the async native PNG writer
    if errors:
        print('!! %d image writes failed' % errors)
    return save_dir
