"""Generator/discriminator shape and wiring tests for every target config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.models import (
    CondGNet, CondGNetCatZ, CondGNetCatZCA, DNet, EntityDNet, GNet, JointDNet,
    build_discriminators, build_generator)
from text2img_ekl_tpu.train.step import cond_code_width

RNG = jax.random.PRNGKey(0)
REF_CFG_DIR = '/root/reference/cfg'
F32 = jnp.float32


def _small(cfg):
    """Shrink dims so CPU tests stay fast."""
    cfg.GAN.GF_DIM = 16
    cfg.GAN.DF_DIM = 16
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    return cfg


def _init_and_run_g(G, cfg, B=2):
    import functools
    rngs = {'params': RNG, 'reparam': RNG, 'cls_prior': RNG}
    noise = jnp.zeros((B, cfg.GAN.Z_DIM), F32)
    if isinstance(G, GNet):
        args = (noise, jnp.zeros((B, cfg.TEXT.DIMENSION), F32))
    elif isinstance(G, CondGNet):
        args = (noise, jnp.zeros((B, G.cond_dim), F32))
    else:
        args = (noise, jnp.zeros((B, cfg.TEXT.DIMENSION), F32),
                jnp.zeros((B, cfg.GAN.ENTITY_DIM), F32))
    vs = jax.jit(functools.partial(G.init, train=True,
                                   method='init_all'))(rngs, *args)

    def fwd(vs, *args):
        out, _ = G.apply(vs, *args, train=True, rngs={'reparam': RNG},
                         mutable=['batch_stats'])
        imgs = G.apply(vs, out[0], method='image')
        return out, imgs
    out, imgs = jax.jit(fwd)(vs, *args)
    return vs, out[0], imgs, out


@pytest.mark.parametrize('name', [
    'flowers_2stgs.yml',
    'birds_2stgs_catcls_bs32.yml',
    'birds_2stg_splitz_cap_ca.realcls.yml',
    'coco_2stgs.yml',
])
def test_target_config_generators(name):
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    G = build_generator(cfg)
    vs, hcodes, imgs, out = _init_and_run_g(G, cfg)
    sizes = cfg.branch_sizes()
    assert len(imgs) == cfg.TREE.BRANCH_NUM
    for img, s in zip(imgs, sizes):
        assert img.shape == (2, s, s, 3)
        arr = np.asarray(img)
        assert arr.min() >= -1.0 and arr.max() <= 1.0  # tanh range
        assert np.all(np.isfinite(arr))


@pytest.mark.parametrize('name', [
    'birds_2stgs_catcls_bs32.yml',
    'birds_2stg_splitz_cap_ca.realcls.yml',
    'coco_2stgs.yml',
])
def test_target_config_discriminators(name):
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    width = cond_code_width(cfg)
    Ds = build_discriminators(cfg, width)
    assert len(Ds) == cfg.TREE.BRANCH_NUM
    for D, s in zip(Ds, cfg.branch_sizes()):
        img = jnp.zeros((2, s, s, 3), F32)
        cond = jnp.zeros((2, width), F32)
        vs = D.init({'params': RNG}, img, cond, train=True)
        outs, _ = D.apply(vs, img, cond, train=True, mutable=['batch_stats'])
        assert len(outs) == 3
        sen, real, cp = outs
        assert sen.shape == (2,) and real.shape == (2,)
        assert cp.shape == (2, cfg.GAN.ENTITY_DIM + 1)
        # log_softmax rows sum to 1 in prob space
        np.testing.assert_allclose(np.exp(np.asarray(cp)).sum(-1), 1.0,
                                   rtol=1e-4)


def test_gnet_three_stages():
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, 'eval_birds.yml')))
    G = GNet(gf_dim=cfg.GAN.GF_DIM, ef_dim=cfg.GAN.EMBEDDING_DIM,
             z_dim=cfg.GAN.Z_DIM, branch_num=3, dtype=F32)
    noise = jnp.zeros((2, cfg.GAN.Z_DIM), F32)
    txt = jnp.zeros((2, 1024), F32)
    vs = G.init({'params': RNG, 'reparam': RNG}, noise, txt, train=True,
                method='init_all')
    out, _ = G.apply(vs, noise, txt, train=True, rngs={'reparam': RNG},
                     mutable=['batch_stats'])
    hcodes, mu, logvar = out
    assert len(hcodes) == 3
    imgs = G.apply(vs, hcodes, method='image')
    assert [i.shape[1] for i in imgs] == [64, 128, 256]


def test_get_image_two_path_product():
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    G = build_generator(cfg)
    vs, hcodes, imgs, _ = _init_and_run_g(G, cfg)
    prod_imgs = G.apply(vs, hcodes, hcodes, method='get_image')
    assert len(prod_imgs) == len(imgs)
    assert prod_imgs[0].shape == imgs[0].shape


def test_exchange_capsule_variant():
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    cfg.TRAIN.EXCHANGE = True
    G = build_generator(cfg)
    vs, hcodes, imgs, _ = _init_and_run_g(G, cfg)
    assert imgs[0].shape == (2, 64, 64, 3)


def test_exchange_capsule_variant_z100():
    """The flagship yml's commented alternative (Z_DIM: 100 with
    EXCHANGE): the class half is MANIFD_DIM + Z_DIM = 228 wide, which
    does not divide into length-8 capsules — the branch must zero-pad
    like CondInitStageGWithCap instead of crashing in reshape."""
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    cfg.TRAIN.EXCHANGE = True
    cfg.GAN.Z_DIM = 100
    G = build_generator(cfg)
    vs, hcodes, imgs, _ = _init_and_run_g(G, cfg)
    assert imgs[0].shape == (2, 64, 64, 3)


def test_cat_z_product_and_sum():
    for cat in ['product', 'sum']:
        cfg = _small(cfg_from_file(
            os.path.join(REF_CFG_DIR, 'birds_2stgs_catcls_bs32.yml')))
        cfg.TRAIN.CAT_Z = cat
        G = build_generator(cfg)
        vs, hcodes, imgs, _ = _init_and_run_g(G, cfg)
        assert imgs[-1].shape[1] == cfg.imsize


def test_d_capsule_head():
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    assert cfg.TRAIN.D_CAPSULE
    D = build_discriminators(cfg, cond_code_width(cfg))[0]
    assert D.use_cap
    img = jnp.zeros((2, 64, 64, 3), F32)
    cond = jnp.zeros((2, cond_code_width(cfg)), F32)
    vs = D.init({'params': RNG}, img, cond, train=True)
    outs, _ = D.apply(vs, img, cond, train=True, mutable=['batch_stats'])
    assert outs[2].shape == (2, 201)


def test_entity_dnet():
    D = EntityDNet(ndf=16, entity_dim=20, imsize=64, dtype=F32)
    img = jnp.zeros((2, 64, 64, 3), F32)
    vs = D.init({'params': RNG}, img, train=True)
    tp, cp = D.apply(vs, img, train=True, mutable=['batch_stats'])[0]
    assert tp.shape == (2,) and cp.shape == (2, 21)


@pytest.mark.parametrize('size', [64, 128, 256, 512])
def test_dnet_all_sizes(size):
    D = DNet(ndf=8, ef_dim=16, imsize=size, b_condition=True, dtype=F32)
    img = jnp.zeros((1, size, size, 3), F32)
    cond = jnp.zeros((1, 16), F32)
    vs = D.init({'params': RNG}, img, cond, train=True)
    outs, _ = D.apply(vs, img, cond, train=True, mutable=['batch_stats'])
    assert outs[0].shape == (1,) and outs[1].shape == (1,)


def test_cond_gnet_catz_double_vc():
    """The VC+VC split-z assembly (reference COND_G_NET_CATZ,
    model.py:567-665): two VCNets, fused code, full stage run with both
    KL tuples returned."""
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stgs_catcls_bs32.yml')))
    G = CondGNetCatZ(sen_dim=cfg.TEXT.DIMENSION, cls_dim=cfg.GAN.ENTITY_DIM,
                     gf_dim=cfg.GAN.GF_DIM, manifd_dim=cfg.GAN.MANIFD_DIM,
                     branch_num=2, dtype=F32)
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM), F32)
    sen = jnp.zeros((B, cfg.TEXT.DIMENSION), F32)
    cls = jnp.zeros((B, cfg.GAN.ENTITY_DIM), F32)
    import functools
    rngs = {'params': RNG, 'reparam': RNG}
    vs = jax.jit(functools.partial(G.init, train=True,
                                   method='init_all'))(rngs, noise, sen, cls)

    def fwd(vs):
        out, _ = G.apply(vs, noise, sen, cls, train=True,
                         rngs={'reparam': RNG}, mutable=['batch_stats'])
        return out, G.apply(vs, out[0], method='image')
    out, imgs = jax.jit(fwd)(vs)
    hcodes, mu1, mu2, lv1, lv2, std1, std2 = out
    assert len(hcodes) == 2
    assert mu1.shape == (B, cfg.GAN.MANIFD_DIM)
    assert mu2.shape == (B, cfg.GAN.MANIFD_DIM)
    assert [i.shape[1] for i in imgs] == [64, 128]
