"""End-to-end slice: config -> synthetic data -> train -> checkpoint ->
resume -> evaluate (sample images to disk) -> IS over the directory.

This is SURVEY.md section 7's "minimum end-to-end slice" exercised as one
test, at tiny dims on the virtual CPU mesh.
"""

import glob
import os

import jax
import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file

REF = '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml'


@pytest.fixture(scope='module')
def tiny_cfg(tmp_path_factory):
    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.MAX_EPOCH = 1
    cfg.TRAIN.SNAPSHOT_INTERVAL = 1
    cfg.TRAIN.VIS_COUNT = 4
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TPU_DATA_PARALLEL = 2  # 2-shard mesh
    cfg.WORKERS = 1
    return cfg


def test_train_checkpoint_resume_evaluate(tiny_cfg, tmp_path):
    from text2img_ekl_tpu.train.trainer import CondGANTrainer

    out = str(tmp_path / 'run')
    trainer = CondGANTrainer(tiny_cfg, out)
    # shrink the synthetic dataset for speed
    from text2img_ekl_tpu.data import DataLoader, SyntheticTextDataset
    ds = SyntheticTextDataset(num_items=16, base_size=64, branch_num=2,
                              entity_dim=tiny_cfg.GAN.ENTITY_DIM,
                              text_dim=tiny_cfg.TEXT.DIMENSION)
    trainer.data_loader = DataLoader(ds, trainer.batch_size, num_workers=1)
    trainer.num_batches = len(trainer.data_loader)

    state = trainer.train(max_steps=3)
    assert int(np.asarray(state.step)) == 3
    # epoch images + snapshot written
    assert os.path.exists(os.path.join(out, 'Image', 'real_samples.png'))
    ckpts = glob.glob(os.path.join(out, 'Model', 'state_epoch*'))
    assert ckpts, 'snapshot missing'

    # resume: a fresh trainer picks up the latest checkpoint
    trainer2 = CondGANTrainer(tiny_cfg, out)
    trainer2.data_loader = trainer.data_loader
    trainer2.num_batches = trainer.num_batches
    state2 = trainer2.train(max_steps=1)
    assert int(np.asarray(state2.step)) == 4  # 3 + 1

    # evaluate: sample the test split through the same state. Deep-copy:
    # nested config sections are shared by dataclasses.replace. The eval
    # configs set TEST.G_CAPSULE explicitly (the reference's
    # birds_2stg_splitz_cap_ca_eval.realcls.yml does) so the rebuilt G
    # matches the trained capsule params.
    import copy
    eval_cfg = copy.deepcopy(tiny_cfg)
    eval_cfg.TEST.B_EXAMPLE = False
    eval_cfg.TEST.G_CAPSULE = True
    eval_cfg.TRAIN.FLAG = False
    ev = CondGANTrainer(eval_cfg, out)
    ds_t = SyntheticTextDataset(num_items=4, base_size=64, branch_num=2,
                                entity_dim=eval_cfg.GAN.ENTITY_DIM,
                                text_dim=eval_cfg.TEXT.DIMENSION,
                                train_pairs=False)
    ev.data_loader = DataLoader(ds_t, 2, shuffle=False, num_workers=1)
    ev.num_batches = len(ev.data_loader)
    save_dir = ev.evaluate('test', state=state2, max_batches=1)
    pngs = glob.glob(os.path.join(save_dir, 'single_samples', '**', '*.png'),
                     recursive=True)
    assert len(pngs) >= 10  # 10 captions x 1 noise x batch 2 / ...
    # filenames carry the reference scheme
    assert '_class' in pngs[0] and '_sid' in pngs[0] and '_nid' in pngs[0]

    # IS over the sampled directory (random inception weights: relative)
    from inception_score import load_images
    from text2img_ekl_tpu.eval.convert_tf import random_inception_variables
    from text2img_ekl_tpu.eval.inception_score import InceptionScorer
    imgs = load_images(os.path.join(save_dir, 'single_samples'), limit=8)
    scorer = InceptionScorer(
        random_inception_variables(jax.random.PRNGKey(0), 51), 51,
        batch_size=8)
    mean, std = scorer.score_images(imgs, num_splits=1)
    assert np.isfinite(mean) and mean >= 1.0

    # --- train-mode resume from TRAIN.NET_G (cub_trainer:170-184) -------
    ckpt0 = os.path.join(out, 'Model', 'state_epoch0')
    assert os.path.exists(ckpt0)
    import copy as _copy
    resume_cfg = _copy.deepcopy(tiny_cfg)
    resume_cfg.TRAIN.NET_G = ckpt0
    # the parsed epoch (0 -> resume at 1) must leave room to actually train
    resume_cfg.TRAIN.MAX_EPOCH = 2
    trainer3 = CondGANTrainer(resume_cfg, out)
    trainer3.data_loader = trainer.data_loader
    trainer3.num_batches = trainer.num_batches
    state3 = trainer3.train(max_steps=1)
    # restored the full state (step counter came back from the checkpoint)
    assert int(np.asarray(state3.step)) == int(np.asarray(state2.step)) + 1

    # --- reference eval dir naming + cls_share + SAMPLE_NUM protocol ----
    eval_cfg2 = _copy.deepcopy(eval_cfg)
    eval_cfg2.TRAIN.NET_G = ckpt0
    eval_cfg2.TEST.CLS_PRIOR = True
    eval_cfg2.TEST.CLS_SHARE = True
    eval_cfg2.TEST.SAMPLE_NUM = 50  # > one pass (4 items x 10 captions x 1)
    ev2 = CondGANTrainer(eval_cfg2, out)
    ev2.data_loader = ev.data_loader
    ev2.num_batches = ev.num_batches
    # dir name encodes mode / clsprior-share / epoch token / run token
    # (cub_trainer_splitz_cap_ca.py:829-845)
    rel = ev2._eval_save_dir('trainmode')  # run token = NET_G's [-3] part
    assert rel == os.path.join(
        'eval', 'Testset_trainmode_fixednoise_clsprior-share_0_run')
    save_dir2 = ev2.evaluate('test', state=state3)  # no max_batches: 30k path
    pngs2 = glob.glob(os.path.join(save_dir2, 'single_samples', '**',
                                   '*.png'), recursive=True)
    # honors TEST.SAMPLE_NUM by re-passing the loader with fresh noise ids
    assert len(pngs2) == 50
    assert any('_nid1' in p for p in pngs2)  # second pass happened
