#!/usr/bin/env python
"""Real-data / real-checkpoint validation harness.

One command that, given the real artifacts (none of which exist in the
build environment), runs the full reference comparison and prints a
PASS/FAIL table at the 1% bar:

    python tools/validate_real.py --data_dir ../data/birds \
        --net_g Model/netG_210000.pth [--net_d Model/netD] \
        --is_ckpt model.ckpt [--fid_pb classify_image_graph_def.pb] \
        [--fid_stats real_stats.npz] \
        [--expected_is 3.2] [--expected_fid F]

Stages (each skipped gracefully when its artifact is missing, so the same
script runs end-to-end on synthetic data + fabricated checkpoints in CI —
tests/test_validate_real.py):

  1. train smoke   — a few fused steps on the configured data
  2. eval protocol — trainer.evaluate sampling (TEST.SAMPLE_NUM capped by
                     --sample_num; the reference protocol is 30k samples,
                     miscc/config.py:32, cub_trainer_splitz_cap_ca.py:677)
  3. IS fine-tuned — 51-class slim checkpoint flavor
                     (reference inception_score.py), 10 splits
  4. IS general    — frozen 2015 graph flavor
                     (reference inception_score_general.py)
  5. FID           — frozen-graph pool_3 vs --fid_stats npz or a real
                     image dir (reference fid.py)
  6. comparison    — against --expected_is/--expected_fid (defaults from
                     BASELINE.md: published CUB IS values 3.2/2.7/2.5/2.3,
                     save-gates 3.4 fine-tuned / 5.5 general / 6.0 COCO)

Exit code 0 = every comparison that could run passed at the 1% bar.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

PCT_BAR = 0.01  # "FID/IS within 1% of the reference pipeline" (SURVEY.md)


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default=os.path.join(
        _ROOT, 'cfg', 'birds_2stg_splitz_cap_ca.realcls.yml'))
    ap.add_argument('--data_dir', default='')
    ap.add_argument('--net_g', default='',
                    help='reference netG .pth or an orbax state dir')
    ap.add_argument('--net_d', default='',
                    help="reference netD prefix ('%%s%%d.pth')")
    ap.add_argument('--is_ckpt', default='',
                    help='fine-tuned TF-slim IS checkpoint (51 classes)')
    ap.add_argument('--fid_pb', default=os.environ.get('T2I_FID_PB', ''),
                    help='classify_image_graph_def.pb')
    ap.add_argument('--fid_stats', default='',
                    help='precomputed real-set mu/sigma .npz')
    ap.add_argument('--expected_is', type=float, default=3.2,
                    help='reference IS to compare at the 1%% bar '
                         '(BASELINE.md: 3.2 best published CUB)')
    ap.add_argument('--expected_is_general', type=float, default=None)
    ap.add_argument('--expected_fid', type=float, default=None)
    ap.add_argument('--train_steps', type=int, default=4)
    ap.add_argument('--sample_num', type=int, default=64,
                    help='eval samples (reference protocol: 30000)')
    ap.add_argument('--splits', type=int, default=10)
    ap.add_argument('--synthetic', action='store_true')
    ap.add_argument('--fetch', action='store_true',
                    help='opportunistically download the frozen 2015 '
                         'inception graph (the reference fid.py:190-206 '
                         'URL) into --out_dir when --fid_pb is absent; '
                         'degrades gracefully offline (this build env '
                         'has zero egress — see DEPLOY.md "Real-weight '
                         'validation gate")')
    ap.add_argument('--out', default='', help='write the report JSON here')
    ap.add_argument('--out_dir', default=os.path.join(
        _ROOT, 'output', 'validate_real'),
        help='working dir for checkpoints/samples')
    return ap.parse_args(argv)


def try_fetch_frozen_pb(out_dir: str) -> str:
    """Best-effort download of the reference's frozen 2015 inception
    graph (fid.py:193 / inception_score_general.py:19). Returns the
    extracted .pb path, or '' when offline/failed. The sha256 of both
    the tgz and the pb are printed so a deploy can pin them (DEPLOY.md
    "Real-weight validation gate" is the offline procedure)."""
    import hashlib
    import tarfile
    import urllib.request

    from text2img_ekl_tpu.eval.convert_tf import (FROZEN_PB_NAME,
                                                  FROZEN_PB_URL)
    pb_path = os.path.join(out_dir, FROZEN_PB_NAME)
    if os.path.exists(pb_path):
        return pb_path
    tgz = os.path.join(out_dir, os.path.basename(FROZEN_PB_URL))
    try:
        os.makedirs(out_dir, exist_ok=True)
        print('fetch: %s ...' % FROZEN_PB_URL, flush=True)
        # urlopen with explicit timeout (urlretrieve has none — a
        # blackholed network would hang the gate instead of degrading)
        import shutil
        with urllib.request.urlopen(FROZEN_PB_URL, timeout=120) as r, \
                open(tgz, 'wb') as out:
            shutil.copyfileobj(r, out)
        with open(tgz, 'rb') as f:
            print('fetch: tgz sha256 %s'
                  % hashlib.sha256(f.read()).hexdigest())
        with tarfile.open(tgz, 'r:gz') as f:
            f.extract(FROZEN_PB_NAME, out_dir)
        with open(pb_path, 'rb') as f:
            print('fetch: pb sha256 %s'
                  % hashlib.sha256(f.read()).hexdigest())
        return pb_path
    except Exception as e:
        print('fetch: FAILED (%s: %s) — offline? The exact manual '
              'procedure is DEPLOY.md "Real-weight validation gate".'
              % (type(e).__name__, e))
        return ''


def _compare(name, measured, expected, rows, lower_is_better=False):
    if measured is None:
        rows.append((name, None, expected, 'SKIP (not measured)'))
        return
    if expected is None:
        rows.append((name, measured, None, 'INFO (no reference value)'))
        return
    rel = abs(measured - expected) / max(abs(expected), 1e-9)
    ok = rel <= PCT_BAR or (lower_is_better and measured < expected)
    rows.append((name, measured, expected,
                 'PASS' if ok else 'FAIL (%.1f%% off)' % (100 * rel)))


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax

    from text2img_ekl_tpu.config import cfg_from_file

    cfg = cfg_from_file(args.cfg)
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.synthetic:
        cfg.TPU_SYNTHETIC_DATA = True
    report = {'weights': {}, 'stages': {}}

    if args.fetch and not args.fid_pb:
        args.fid_pb = try_fetch_frozen_pb(args.out_dir)
        report['weights']['fid_pb_fetch'] = ('ok' if args.fid_pb
                                             else 'offline/failed')

    # ---- stage 1: train smoke ---------------------------------------
    from text2img_ekl_tpu.train.trainer import CondGANTrainer
    out_dir = args.out_dir
    os.makedirs(out_dir, exist_ok=True)
    cfg.TRAIN.FLAG = True
    cfg.TRAIN.MAX_EPOCH = 1
    if args.net_d:
        cfg.TRAIN.NET_D = args.net_d
    trainer = CondGANTrainer(cfg, out_dir)
    state = trainer.train(max_steps=args.train_steps)
    report['stages']['train_smoke'] = {
        'steps': args.train_steps, 'ok': True,
        'synthetic': bool(cfg.TPU_SYNTHETIC_DATA)}
    print('== train smoke: %d steps OK' % args.train_steps)

    # ---- stage 2: eval protocol (sampling) --------------------------
    cfg.TRAIN.FLAG = False
    cfg.TEST.B_EXAMPLE = False
    cfg.TEST.SAMPLE_NUM = args.sample_num
    # keep the eval-built generator architecturally identical to the one
    # just trained (the reference does this via a separate _eval yml whose
    # TEST.G_CAPSULE mirrors the train config's TRAIN.G_CAPSULE)
    cfg.TEST.G_CAPSULE = cfg.TRAIN.G_CAPSULE
    if args.net_g:
        cfg.TRAIN.NET_G = args.net_g
    evaler = CondGANTrainer(cfg, out_dir)
    sample_dir = evaler.evaluate(
        'test', state=None if args.net_g else state)
    report['stages']['evaluate'] = {'dir': sample_dir}
    print('== eval sampling: %s' % sample_dir)

    from inception_score import load_images
    images = load_images(sample_dir, limit=args.sample_num)
    if not images:
        print('!! no sampled images found — aborting metric stages')
        return 1
    imgs = np.stack(images)
    rows = []

    # ---- stage 3: fine-tuned IS -------------------------------------
    from text2img_ekl_tpu.eval.convert_tf import (
        load_slim_checkpoint, random_inception_variables, slim_vars_to_flax)
    from text2img_ekl_tpu.eval.inception_score import InceptionScorer
    have_ckpt = bool(args.is_ckpt) and (
        os.path.exists(args.is_ckpt)
        or os.path.exists(args.is_ckpt + '.index'))
    variables = random_inception_variables(jax.random.PRNGKey(0), 51)
    if have_ckpt:
        variables = slim_vars_to_flax(
            load_slim_checkpoint(args.is_ckpt, 51), variables)
    report['weights']['is_ckpt'] = 'loaded' if have_ckpt else 'RANDOM'
    scorer = InceptionScorer(variables, 51, finetuned=True)
    is_mean, is_std = scorer.score_images(imgs, args.splits)
    report['stages']['is_finetuned'] = {
        'mean': is_mean, 'std': is_std, 'weights': report['weights']['is_ckpt']}
    print('== IS (fine-tuned%s): %.4f +- %.4f'
          % ('' if have_ckpt else ', RANDOM WEIGHTS', is_mean, is_std))
    _compare('IS fine-tuned', is_mean if have_ckpt else None,
             args.expected_is, rows)

    # ---- stage 4: general IS ----------------------------------------
    have_pb = bool(args.fid_pb) and os.path.exists(args.fid_pb)
    if have_pb:
        gscorer = InceptionScorer.from_frozen_pb(args.fid_pb)
        gis_mean, gis_std = gscorer.score_images(imgs, args.splits)
        report['weights']['fid_pb'] = 'loaded'
        print('== IS (general/frozen-pb): %.4f +- %.4f'
              % (gis_mean, gis_std))
        _compare('IS general', gis_mean, args.expected_is_general, rows)
    else:
        report['weights']['fid_pb'] = 'MISSING'
        gis_mean = None
        print('== IS (general): skipped, no --fid_pb')
        _compare('IS general', None, args.expected_is_general, rows)
    report['stages']['is_general'] = {'mean': gis_mean}

    # ---- stage 5: FID -----------------------------------------------
    fid_val = None
    if have_pb and (args.fid_stats or args.data_dir):
        from text2img_ekl_tpu.eval.fid import FIDScorer
        fs = FIDScorer.from_frozen_pb(args.fid_pb)
        if args.fid_stats and os.path.exists(args.fid_stats):
            fid_val = fs.fid_against_stats(imgs, args.fid_stats)
        elif args.data_dir and os.path.isdir(args.data_dir):
            real = load_images(args.data_dir, limit=args.sample_num)
            if real:
                fid_val = fs.fid_between(imgs, np.stack(real))
        if fid_val is not None:
            print('== FID: %.4f' % fid_val)
    if fid_val is None:
        print('== FID: skipped (needs --fid_pb and --fid_stats/--data_dir)')
    report['stages']['fid'] = {'value': fid_val}
    _compare('FID', fid_val, args.expected_fid, rows)

    # ---- stage 6: comparison table ----------------------------------
    print('\n%-16s %10s %10s  %s' % ('metric', 'measured', 'reference',
                                     'verdict'))
    failed = False
    for name, meas, exp, verdict in rows:
        print('%-16s %10s %10s  %s'
              % (name,
                 '%.4f' % meas if meas is not None else '-',
                 '%.4f' % exp if exp is not None else '-', verdict))
        failed |= verdict.startswith('FAIL')
    print('\nIS save-gates for context (BASELINE.md): 3.4 fine-tuned / '
          '5.5 general / 6.0 COCO')
    report['rows'] = rows
    report['failed'] = failed
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2, default=float)
        print('report -> %s' % args.out)
    return 1 if failed else 0


if __name__ == '__main__':
    sys.exit(main())
