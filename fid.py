#!/usr/bin/env python
"""Standalone FID between two paths (dirs of images or .npz stats).

TPU-native equivalent of the reference FID CLI (reference: fid.py:238-250):

    python fid.py path_generated path_real_or_npz [--batch 50]

Each path is an image directory or a precomputed .npz with mu/sigma
(reference: fid.py:208-219). Activations run on the accelerator via the JAX
InceptionV3; sqrtm on host via scipy, as the reference does.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _handle_path(path: str, scorer):
    if path.endswith('.npz'):
        with np.load(path) as f:
            return f['mu'][:], f['sigma'][:]
    from inception_score import load_images
    images = load_images(path)
    if not images:
        raise RuntimeError('no images under %s' % path)
    return scorer.statistics(np.stack(images), uint8=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('path', nargs=2,
                    help='image dirs or .npz statistics files')
    ap.add_argument('--batch', type=int, default=50)
    ap.add_argument('--save_stats', default='',
                    help='save first path stats to this .npz and exit')
    args = ap.parse_args()

    import jax
    from text2img_ekl_tpu.eval.convert_tf import random_inception_variables
    from text2img_ekl_tpu.eval.fid import FIDScorer, \
        calculate_frechet_distance

    variables = random_inception_variables(jax.random.PRNGKey(0), 1000)
    print('!! inception weights are random unless a converted checkpoint is '
          'wired in; FID is relative-only in that case')
    scorer = FIDScorer(variables, batch_size=args.batch)

    mu1, s1 = _handle_path(args.path[0], scorer)
    if args.save_stats:
        np.savez(args.save_stats, mu=mu1, sigma=s1)
        print('saved stats to', args.save_stats)
        return
    mu2, s2 = _handle_path(args.path[1], scorer)
    print('FID:', calculate_frechet_distance(mu1, s1, mu2, s2))


if __name__ == '__main__':
    main()
