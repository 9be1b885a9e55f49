#!/usr/bin/env python
"""CLI launcher — same interface as the reference main.py.

    python main.py --cfg cfg/birds_2stg_splitz_cap_ca.realcls.yml \
        --data_dir ../data/birds --manualSeed 47

Differences from the reference (main.py:60-161): ``--gpu`` is accepted for
compatibility but device selection is mesh-based (``TPU_DATA_PARALLEL``
shards over all visible TPU chips); everything else — config merge, seeding
policy (fixed seed 100 at eval, main.py:87-94), output dir naming, train/eval
dispatch — is preserved.
"""

from __future__ import annotations

import argparse
import datetime
import os
import pprint
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from text2img_ekl_tpu.config import cfg_from_file  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(description='Train a GAN network (TPU)')
    parser.add_argument('--cfg', dest='cfg_file', type=str,
                        default='cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    parser.add_argument('--gpu', dest='gpu_id', type=str, default='-1',
                        help='compat only; mesh uses all visible devices')
    parser.add_argument('--data_dir', dest='data_dir', type=str, default='')
    parser.add_argument('--manualSeed', type=int, help='manual seed')
    parser.add_argument('--max_steps', type=int, default=None,
                        help='stop after N optimizer steps (train) or N '
                             'data batches (eval) — debug only')
    parser.add_argument('--synthetic', action='store_true',
                        help='force the synthetic dataset')
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = cfg_from_file(args.cfg_file)
    if args.gpu_id != '-1':
        cfg.GPU_ID = args.gpu_id
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.synthetic:
        cfg.TPU_SYNTHETIC_DATA = True
    print('Using config:')
    pprint.pprint(cfg.to_dict())

    if not cfg.TRAIN.FLAG:
        args.manualSeed = 100
    elif args.manualSeed is None:
        args.manualSeed = random.randint(1, 10000)
    random.seed(args.manualSeed)
    import numpy as np
    np.random.seed(args.manualSeed)

    split_dir = 'train'
    if not cfg.TRAIN.FLAG and cfg.DATASET_NAME in ('birds', 'flowers'):
        split_dir = 'test'

    print('Top-stack images size: %dx%d' % (cfg.imsize, cfg.imsize))

    if os.environ.get('T2I_PLATFORM'):
        # the JAX_PLATFORMS env var is ignored in images whose
        # sitecustomize force-registers a TPU plugin; jax.config is the
        # working switch (PERF.md) — used by the multi-process CPU smoke
        import jax
        jax.config.update('jax_platforms', os.environ['T2I_PLATFORM'])

    from text2img_ekl_tpu.parallel.mesh import init_distributed
    distributed = init_distributed()
    if distributed:
        print('jax.distributed initialized (multi-host)')

    timestamp = datetime.datetime.now().strftime('%Y_%m_%d_%H_%M_%S')
    if distributed:
        # every host must use the SAME run directory: wall clocks drift
        # across machines, and orbax checkpoint saves are collective
        # (all processes write shards under one path)
        import jax
        import numpy as np
        from jax.experimental import multihost_utils
        buf = np.frombuffer(timestamp.encode().ljust(32), np.uint8)
        buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
        timestamp = bytes(buf).decode().strip()
    output_dir = './output/%s_%s_%s' % (
        cfg.DATASET_NAME, cfg.CONFIG_NAME, timestamp)

    from text2img_ekl_tpu.train.trainer import CondGANTrainer
    algo = CondGANTrainer(cfg, output_dir)

    start_t = time.time()
    if cfg.TRAIN.FLAG:
        algo.train(max_steps=args.max_steps)
    else:
        algo.evaluate(split_dir, max_batches=args.max_steps)
    end_t = time.time()
    print('Total time for training:', end_t - start_t)


if __name__ == '__main__':
    main()
