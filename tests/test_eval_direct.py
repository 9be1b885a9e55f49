"""Direct on-device eval scoring (TPU_EVAL_DIRECT) parity tests.

The reference's offline metric protocol dumps 30k PNGs and reloads them
(cub_trainer_splitz_cap_ca.py:776-911, then is_of_dir.py / fid.py:208-219).
The PNG round trip is lossless uint8, so the direct path — feeding the
sampler's device-resident uint8 stacks straight into the metric towers —
must produce the SAME scores; these tests pin that equivalence at the
scorer level and end-to-end through CondGANTrainer.evaluate.
"""

import glob
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.eval.convert_tf import random_inception_variables
from text2img_ekl_tpu.eval.inception_score import InceptionScorer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = '/root/reference/cfg'


def test_direct_is_matches_png_roundtrip(tmp_path):
    """add_uint8_row on the [C, B, H, W, 3] stack == saving every image
    as PNG, reloading, and scoring the directory (splits=1: the score is
    then invariant to the directory's sort order)."""
    from inception_score import load_images
    from text2img_ekl_tpu.io_utils.images import (flush_writes,
                                                  save_single_images)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 6, 64, 64, 3), dtype=np.uint8)
    variables = random_inception_variables(jax.random.PRNGKey(3), 51)

    direct = InceptionScorer(variables, 51)
    cb = jnp.asarray(imgs)
    for si in range(2):
        direct.add_uint8_row(cb, si)
    assert direct.count == 12
    mean_direct, _ = direct.score(num_splits=1)

    names = ['item%d' % i for i in range(6)]
    for si in range(2):
        save_single_images(imgs[si], names, str(tmp_path), 'test', si,
                           list(range(6)), 64, 0)
    flush_writes()
    loaded = load_images(str(tmp_path))
    assert len(loaded) == 12
    mean_png, _ = InceptionScorer(variables, 51).score_images(
        np.stack(loaded), num_splits=1)

    assert abs(mean_direct - mean_png) <= 1e-3


def test_fid_row_accumulation_matches_batch():
    """FIDScorer.add_uint8_row over every caption row accumulates the
    same statistics as the flat activations_uint8 path."""
    from text2img_ekl_tpu.eval.fid import FIDScorer

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (3, 4, 64, 64, 3), dtype=np.uint8)
    variables = random_inception_variables(jax.random.PRNGKey(5), 51)
    fs = FIDScorer(variables, 51, batch_size=12)

    cb = jnp.asarray(imgs)
    for si in range(3):
        fs.add_uint8_row(cb, si)
    mu_rows, sig_rows = fs.accumulated_statistics()

    flat = imgs.reshape(-1, 64, 64, 3).astype(np.float32)
    acts = fs.activations_uint8(flat)
    from text2img_ekl_tpu.eval.fid import calculate_activation_statistics
    mu_flat, sig_flat = calculate_activation_statistics(acts)
    np.testing.assert_allclose(mu_rows, mu_flat, atol=1e-4)
    np.testing.assert_allclose(sig_rows, sig_flat, atol=1e-4)


def test_trainer_direct_eval_matches_png_protocol(tmp_path):
    """End-to-end: the SAME evaluate protocol run twice — default (PNG
    dump) and TPU_EVAL_DIRECT — must give the same IS ≤1e-3, and the
    direct run must write direct_scores.json and zero PNGs."""
    from inception_score import load_images
    from text2img_ekl_tpu.train.state import create_train_state
    from text2img_ekl_tpu.train.trainer import CondGANTrainer

    def make(outdir, direct):
        cfg = cfg_from_file('%s/birds_2stg_splitz_cap_ca.realcls.yml' % REF)
        cfg.GAN.GF_DIM = 8
        cfg.GAN.DF_DIM = 8
        cfg.TRAIN.BATCH_SIZE = 2
        cfg.TRAIN.FLAG = False
        cfg.TEST.B_EXAMPLE = False
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_SYNTHETIC_DATA = True
        cfg.TPU_DATA_PARALLEL = 1
        cfg.TPU_EVAL_DIRECT = direct
        cfg.WORKERS = 1
        tr = CondGANTrainer(cfg, str(outdir))
        state = create_train_state(cfg, tr.G, tr.Ds, jax.random.PRNGKey(0),
                                   tr.cond_width, mesh=tr.mesh)
        return tr, state

    # PNG protocol run (fresh np_rng(100) per evaluate call -> identical
    # noise/captions across the two runs)
    tr_png, st = make(tmp_path / 'png', direct=False)
    d_png = tr_png.evaluate('test', state=st, max_batches=1)
    pngs = glob.glob(os.path.join(d_png, 'single_samples', '**', '*.png'),
                     recursive=True)
    assert pngs
    # score the PNGs with the same (deterministic PRNGKey(7)) tower the
    # direct path builds
    variables = random_inception_variables(jax.random.PRNGKey(7), 51)
    is_png, _ = InceptionScorer(variables, 51).score_images(
        np.stack(load_images(os.path.join(d_png, 'single_samples'))),
        num_splits=1)

    tr_dir, st2 = make(tmp_path / 'direct', direct=True)
    d_dir = tr_dir.evaluate('test', state=st2, max_batches=1)
    assert not glob.glob(os.path.join(d_dir, '**', '*.png'), recursive=True)
    with open(os.path.join(d_dir, 'direct_scores.json')) as f:
        scores = json.load(f)
    assert scores['images'] == len(pngs)
    assert np.isfinite(scores['is_mean'])
    assert abs(scores['is_mean'] - is_png) <= 1e-3
