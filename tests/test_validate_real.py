"""validate_real harness end-to-end on synthetic data + fabricated pb.

The real artifacts (CUB data, fine-tuned IS checkpoint, the 2015 pb) do
not exist in this environment; this proves the single-command harness
(tools/validate_real.py) runs train-smoke -> eval-sampling -> IS (both
flavors) -> FID -> comparison table, so flipping to real artifacts is a
path change only (VERDICT round-2 item 7).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_validate_real_runs_end_to_end(tmp_path):
    tf = pytest.importorskip('tensorflow')
    import yaml

    from text2img_ekl_tpu.config import cfg_from_file
    from tools.fabricate_frozen_pb import write_frozen_pb
    from tools.validate_real import main

    cfg = cfg_from_file(
        '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.WORKERS = 0
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TRAIN.SNAPSHOT_INTERVAL = 1000
    cfg_path = tmp_path / 'tiny.yml'
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg.to_dict(), f)

    pb_path = str(tmp_path / 'classify_image_graph_def.pb')
    write_frozen_pb(pb_path, seed=5)

    # fabricated real-set FID stats (PSD sigma)
    rs = np.random.RandomState(0)
    a = rs.randn(2048, 32).astype(np.float32) * 0.05
    np.savez(tmp_path / 'stats.npz', mu=rs.randn(2048).astype(np.float32),
             sigma=a @ a.T + np.eye(2048, dtype=np.float32) * 1e-3)

    out_json = str(tmp_path / 'report.json')
    rc = main(['--cfg', str(cfg_path), '--synthetic',
               '--train_steps', '2', '--sample_num', '4', '--splits', '2',
               '--fid_pb', pb_path,
               '--fid_stats', str(tmp_path / 'stats.npz'),
               '--out_dir', str(tmp_path / 'work'),
               '--out', out_json])
    assert rc == 0
    with open(out_json) as f:
        report = json.load(f)
    assert report['stages']['train_smoke']['ok']
    assert report['stages']['is_general']['mean'] is not None
    assert report['stages']['fid']['value'] is not None
    assert np.isfinite(report['stages']['fid']['value'])
    assert report['weights']['fid_pb'] == 'loaded'
    # no real reference values supplied -> nothing may FAIL
    assert not report['failed']
