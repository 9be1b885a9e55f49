"""StableHLO serving export: serialize -> deserialize -> exact parity."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.io_utils.export_hlo import (load_serving,
                                                  make_serving_exported,
                                                  serving_cond_shapes)
from text2img_ekl_tpu.models import build_generator
from text2img_ekl_tpu.train.step import (_pm1_to_uint8_dev, _sample_core,
                                         cond_code_width)

REF_CFG_DIR = '/root/reference/cfg'


def _small(cfg):
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    return cfg


def _init_eval_g(cfg, bs):
    G = build_generator(cfg, train_flag=False)
    noise = jnp.zeros((bs, cfg.GAN.Z_DIM), jnp.float32)
    conds = [jnp.zeros(s.shape, s.dtype)
             for s in serving_cond_shapes(cfg, bs)]
    rngs = {'params': jax.random.PRNGKey(0),
            'reparam': jax.random.PRNGKey(1),
            'cls_prior': jax.random.PRNGKey(2)}
    import functools
    gvars = jax.jit(functools.partial(G.init, train=True,
                                      method='init_all'))(
        rngs, noise, *conds)
    return G, gvars


@pytest.mark.parametrize('cfg_name', [
    'birds_2stg_splitz_cap_ca.realcls.yml', 'coco_2stgs.yml'])
def test_serving_blob_matches_direct_sampler(cfg_name):
    bs = 2
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, cfg_name)))
    cfg.TRAIN.BATCH_SIZE = bs
    G, gvars = _init_eval_g(cfg, bs)

    exported = make_serving_exported(cfg, G, gvars, bs)
    # the artifact must be lowered for BOTH serving backends — a
    # single-platform export refuses to run anywhere else
    assert set(exported.platforms) == {'cpu', 'tpu'}, exported.platforms
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 10_000
    fn = load_serving(bytes(blob))

    rng = np.random.default_rng(0)
    key = np.array([7, 9], np.uint32)
    noise = rng.normal(size=(bs, cfg.GAN.Z_DIM)).astype(np.float32)
    conds = [rng.normal(size=s.shape).astype(np.float32) * 0.3
             for s in serving_cond_shapes(cfg, bs)]

    got = fn(key, noise, *conds)
    sample = _sample_core(G, train_mode=False)

    @jax.jit
    def direct(key, noise, *conds):
        return tuple(_pm1_to_uint8_dev(i)
                     for i in sample(gvars, key, noise, *conds))

    want = direct(jnp.asarray(key), jnp.asarray(noise),
                  *map(jnp.asarray, conds))
    assert len(got) == cfg.TREE.BRANCH_NUM
    for g, w in zip(got, want):
        assert np.asarray(g).dtype == np.uint8
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_weights_are_baked_in():
    """The blob is self-contained: mutating the live variables after
    export must not change its outputs."""
    bs = 2
    cfg = _small(cfg_from_file(os.path.join(
        REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    cfg.TRAIN.BATCH_SIZE = bs
    G, gvars = _init_eval_g(cfg, bs)
    exported = make_serving_exported(cfg, G, gvars, bs)
    fn = load_serving(exported.serialize())
    key = np.array([1, 2], np.uint32)
    noise = np.zeros((bs, cfg.GAN.Z_DIM), np.float32)
    conds = [np.zeros(s.shape, np.float32)
             for s in serving_cond_shapes(cfg, bs)]
    a = np.asarray(fn(key, noise, *conds)[-1])
    gvars['params'] = jax.tree.map(lambda x: x * 0.0, gvars['params'])
    b = np.asarray(fn(key, noise, *conds)[-1])
    np.testing.assert_array_equal(a, b)


def test_export_serving_cli(tmp_path):
    """CLI end-to-end: save an orbax checkpoint, export, load, run.

    The eval-flavor G is selected by TEST.G_CAPSULE (as the reference's
    eval configs set it, e.g. eval_birds.yml) — the derived yaml pins it
    to match the checkpoint's capsule G.
    """
    import yaml
    bs = 2
    with open(os.path.join(REF_CFG_DIR,
                           'birds_2stg_splitz_cap_ca.realcls.yml')) as f:
        raw = yaml.safe_load(f)
    raw['GAN']['GF_DIM'] = 8
    raw['GAN']['DF_DIM'] = 8
    raw.setdefault('TEST', {})['G_CAPSULE'] = True
    cfg_path = str(tmp_path / 'tiny_eval.yml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(raw, f)

    cfg = cfg_from_file(cfg_path)
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TRAIN.BATCH_SIZE = bs
    from text2img_ekl_tpu.models import build_discriminators
    from text2img_ekl_tpu.train import create_train_state
    from text2img_ekl_tpu.io_utils.checkpoint import save_train_state
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg))
    ckpt = str(tmp_path / 'ckpt_000001')
    save_train_state(ckpt, state)
    out = str(tmp_path / 'sampler.stablehlo')
    r = subprocess.run(
        [sys.executable, 'tools/export_serving.py',
         '--cfg', cfg_path,
         '--net_g', ckpt, '--bs', str(bs), '--out', out, '--cpu'],
        cwd='/root/repo', capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    fn = load_serving(open(out, 'rb').read())
    imgs = fn(np.array([3, 4], np.uint32),
              np.zeros((bs, cfg.GAN.Z_DIM), np.float32),
              np.zeros((bs, cfg.TEXT.DIMENSION), np.float32),
              np.zeros((bs, cfg.GAN.ENTITY_DIM), np.float32))
    assert np.asarray(imgs[-1]).shape == (bs, 128, 128, 3)
