"""The in-training IS save gate must not protect-save on random weights.

The reference always loads its fine-tuned inception session before the
gate runs (cub_trainer_splitz_cap_ca.py:504-507) so its absolute save
thresholds (3.4/5.5/6.0 at :670-696) are meaningful. Our tower falls back
to random weights when T2I_INCEPTION_CKPT is absent — an IS of 3.4 from a
random tower is noise, so the threshold-gated "good model" save must be
skipped (loudly) unless real weights are present.
"""

import glob
import os

import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file

REF = '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml'


class _FakeScorer:
    """Epoch-end gate shape: enough pooled predictions and a score far
    above every reference threshold."""

    def __init__(self, real_weights):
        self.count = 3000
        self.real_weights = real_weights

    def add(self, fakes):
        pass

    def score(self, num_splits=1):
        return 9.9, 0.1


def _tiny_cfg():
    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TRAIN.MAX_EPOCH = 1
    cfg.TRAIN.SNAPSHOT_INTERVAL = 100  # no interval snapshot: gate-only
    cfg.TRAIN.VIS_COUNT = 2
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_SYNTHETIC_DATA = True
    # huge interval: the scorer exists (TPU_IS_EVERY=0 would skip
    # building it entirely) but the mid-epoch stream never fires — the
    # epoch-end gate is the only consumer
    cfg.TPU_IS_EVERY = 1000000
    cfg.TPU_DATA_PARALLEL = 2  # 2-shard mesh (global batch 4)
    cfg.WORKERS = 1
    return cfg


@pytest.mark.parametrize('real_weights', [False, True])
def test_is_gate_protect_save_requires_real_weights(
        tmp_path, monkeypatch, capsys, real_weights):
    from text2img_ekl_tpu.train.trainer import CondGANTrainer

    monkeypatch.setattr(CondGANTrainer, '_make_is_scorer',
                        lambda self: _FakeScorer(real_weights))
    cfg = _tiny_cfg()
    out = str(tmp_path / 'run')
    trainer = CondGANTrainer(cfg, out)
    from text2img_ekl_tpu.data import DataLoader, SyntheticTextDataset
    ds = SyntheticTextDataset(num_items=8, base_size=64, branch_num=2,
                              entity_dim=cfg.GAN.ENTITY_DIM,
                              text_dim=cfg.TEXT.DIMENSION)
    trainer.data_loader = DataLoader(ds, trainer.batch_size, num_workers=1)
    trainer.num_batches = len(trainer.data_loader)

    state = trainer.train(max_steps=2)
    assert int(np.asarray(state.step)) == 2
    captured = capsys.readouterr().out
    protected = glob.glob(os.path.join(out, 'Model', '.protect_epoch*'))
    saved = glob.glob(os.path.join(out, 'Model', 'state_epoch*'))
    if real_weights:
        assert 'Saved good model' in captured
        assert protected and saved
    else:
        assert 'Saved good model' not in captured
        assert 'weights are random' in captured
        assert not protected and not saved
