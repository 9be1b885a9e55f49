"""Trainer batch-assembly tests: CUB one-hot vs COCO soft-target paths."""

import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.train.trainer import CondGANTrainer

REF = '/root/reference/cfg'


def _trainer(name, tmp_path):
    cfg = cfg_from_file('%s/%s' % (REF, name))
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.FLAG = True
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TPU_DATA_PARALLEL = 1
    cfg.WORKERS = 1
    return CondGANTrainer(cfg, str(tmp_path))


def test_cub_batch_one_hot_and_shift(tmp_path):
    """CUB class ids are 1-based; targets shift to 0-based one-hots
    (cub_trainer_splitz_cap_ca.py:302-304, 556-557)."""
    tr = _trainer('birds_2stg_splitz_cap_ca.realcls.yml', tmp_path)
    host = next(iter(tr.data_loader))
    batch = tr._device_batch(host)
    onehot = np.asarray(batch['cls_onehot'])
    real_cp = np.asarray(batch['real_cp'])
    assert onehot.shape[1] == 200 and real_cp.shape[1] == 201
    np.testing.assert_array_equal(onehot.sum(1), 1)
    np.testing.assert_array_equal(real_cp.sum(1), 1)
    # the extra 'generated' class is never a real target
    assert real_cp[:, -1].sum() == 0
    cls = np.asarray(host['cls'])
    np.testing.assert_array_equal(np.argmax(onehot, 1), cls - 1)


def test_coco_batch_soft_targets(tmp_path):
    """COCO multi-hots normalize to soft class targets (trainer.py:518) and
    the condition concatenates embedding + multi-hot (trainer.py:526)."""
    tr = _trainer('coco_2stgs.yml', tmp_path)
    host = next(iter(tr.data_loader))
    batch = tr._device_batch(host)
    assert 'cond' in batch and 'txt' not in batch
    cond = np.asarray(batch['cond'])
    assert cond.shape[1] == 1024 + 91
    real_cp = np.asarray(batch['real_cp'])
    np.testing.assert_allclose(real_cp.sum(1), 1.0, rtol=1e-5)
    assert np.all(real_cp >= 0)


def test_coco_evaluate_batched_cond_pattern(tmp_path):
    """COCO evaluate through the all-caption vmapped sampler ('cond'
    pattern: per-caption cond = cat(embedding, multi-hot)); writes the
    reference-named single samples (cub_trainer_splitz_cap_ca.py:758)."""
    import glob
    import os

    import jax
    from text2img_ekl_tpu.data import DataLoader, SyntheticTextDataset
    from text2img_ekl_tpu.train.state import create_train_state

    cfg = cfg_from_file('%s/coco_2stgs.yml' % REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.FLAG = False
    cfg.TEST.B_EXAMPLE = False
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TPU_DATA_PARALLEL = 1
    cfg.WORKERS = 1
    tr = CondGANTrainer(cfg, str(tmp_path))
    ds = SyntheticTextDataset(num_items=4, base_size=64,
                              branch_num=cfg.TREE.BRANCH_NUM,
                              entity_dim=cfg.GAN.ENTITY_DIM,
                              text_dim=cfg.TEXT.DIMENSION,
                              is_coco=True, train_pairs=False)
    tr.data_loader = DataLoader(ds, 2, shuffle=False, num_workers=1)
    tr.num_batches = len(tr.data_loader)
    state = create_train_state(cfg, tr.G, tr.Ds, jax.random.PRNGKey(0),
                               tr.cond_width, mesh=tr.mesh)
    save_dir = tr.evaluate('test', state=state, max_batches=1)
    pngs = glob.glob(os.path.join(save_dir, 'single_samples', '**',
                                  '*.png'), recursive=True)
    assert len(pngs) == 20  # 2 items x 10 captions
    assert all('_sid' in p and '_nid0' in p for p in pngs)


def test_evaluate_b_example_super_grids(tmp_path):
    """TEST.B_EXAMPLE=True keeps the per-caption sampler and writes 10-
    caption super grids instead of single samples
    (cub_trainer_splitz_cap_ca.py:902-908)."""
    import glob
    import os

    import jax
    from text2img_ekl_tpu.data import DataLoader, SyntheticTextDataset
    from text2img_ekl_tpu.train.state import create_train_state

    cfg = cfg_from_file('%s/birds_2stg_splitz_cap_ca.realcls.yml' % REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.FLAG = False
    cfg.TEST.B_EXAMPLE = True
    cfg.TEST.G_CAPSULE = True
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_DATA_PARALLEL = 1
    cfg.WORKERS = 1
    tr = CondGANTrainer(cfg, str(tmp_path))
    ds = SyntheticTextDataset(num_items=4, base_size=64, branch_num=2,
                              entity_dim=cfg.GAN.ENTITY_DIM,
                              text_dim=cfg.TEXT.DIMENSION,
                              train_pairs=False)
    tr.data_loader = DataLoader(ds, 2, shuffle=False, num_workers=1)
    tr.num_batches = len(tr.data_loader)
    state = create_train_state(cfg, tr.G, tr.Ds, jax.random.PRNGKey(0),
                               tr.cond_width, mesh=tr.mesh)
    save_dir = tr.evaluate('test', state=state, max_batches=1)
    grids = glob.glob(os.path.join(save_dir, 'super', '**', '*.png'),
                      recursive=True)
    singles = glob.glob(os.path.join(save_dir, 'single_samples', '**',
                                     '*.png'), recursive=True)
    assert len(grids) == 2 and not singles  # one grid per batch item
