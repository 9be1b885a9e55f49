"""Data-parallel offline eval: `evaluate` commits the all-caption
sampler's batch axis over the mesh (trainer.py shard_eval), partitioning
the 30k protocol across devices. XLA inserts the cross-device reductions
for train-mode BN statistics, so the sharded program computes the same
global-batch semantics as the identical single-device program."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.data import DataLoader, SyntheticTextDataset

REF = '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml'


def _eval_trainer(tmp_path, tag, data_parallel, batch_per_shard):
    import jax
    from text2img_ekl_tpu.train.state import create_train_state
    from text2img_ekl_tpu.train.trainer import CondGANTrainer

    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TRAIN.FLAG = False
    cfg.TEST.B_EXAMPLE = False
    cfg.TEST.G_CAPSULE = True
    cfg.WORKERS = 1
    cfg.TPU_DATA_PARALLEL = data_parallel
    cfg.TRAIN.BATCH_SIZE = batch_per_shard
    tr = CondGANTrainer(cfg, str(tmp_path / tag))
    ds = SyntheticTextDataset(num_items=8, base_size=64, branch_num=2,
                              entity_dim=cfg.GAN.ENTITY_DIM,
                              text_dim=cfg.TEXT.DIMENSION,
                              train_pairs=False)
    tr.data_loader = DataLoader(ds, tr.batch_size, shuffle=False,
                                num_workers=1)
    tr.num_batches = len(tr.data_loader)
    state = tr._place_state(create_train_state(
        cfg, tr.G, tr.Ds, jax.random.PRNGKey(0), tr.cond_width,
        mesh=tr.mesh))
    return tr, state


def _pngs(save_dir):
    paths = sorted(glob.glob(os.path.join(
        save_dir, 'single_samples', '**', '*.png'), recursive=True))
    return {os.path.relpath(p, save_dir):
            np.asarray(Image.open(p)).astype(np.int16) for p in paths}


def test_sharded_eval_matches_single_device(tmp_path):
    """Same items, same host RNG stream: the 8-way-sharded evaluate
    writes the same files with the same pixels (±2 LSB for the BN
    reduction-order difference) as the single-device evaluate."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device virtual mesh')

    tr8, st8 = _eval_trainer(tmp_path, 'm8', data_parallel=8,
                             batch_per_shard=1)   # global batch 8
    assert tr8.num_shards == 8 and tr8.batch_size == 8
    d8 = tr8.evaluate('test', state=st8, max_batches=1)

    tr1, st1 = _eval_trainer(tmp_path, 'm1', data_parallel=1,
                             batch_per_shard=8)   # same global batch
    assert tr1.num_shards == 1 and tr1.batch_size == 8
    d1 = tr1.evaluate('test', state=st1, max_batches=1)

    p8, p1 = _pngs(d8), _pngs(d1)
    assert set(p8) == set(p1)
    assert len(p8) == 80  # 8 items x 10 captions x 1 noise
    for name in p1:
        np.testing.assert_allclose(p8[name], p1[name], atol=2,
                                   err_msg=name)
