#!/usr/bin/env python
"""IS (and optional FID vs precomputed stats) over a sample directory.

Equivalent of the reference driver scripts is.py / is_of_dir.py
(reference: is.py:11-89, is_of_dir.py) as a proper CLI instead of
edit-the-source scripts:

    python is_of_dir.py --dir eval/Testset_... [--fid_stats stats.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dir', required=True)
    ap.add_argument('--checkpoint_dir', default='')
    ap.add_argument('--fid_stats', default='',
                    help='precomputed .npz real-set statistics')
    ap.add_argument('--splits', type=int, default=10)
    ap.add_argument('--limit', type=int, default=0)
    ap.add_argument('--general', action='store_true')
    args = ap.parse_args()

    import jax
    from inception_score import load_images
    from text2img_ekl_tpu.eval.convert_tf import (
        load_slim_checkpoint, random_inception_variables, slim_vars_to_flax)
    from text2img_ekl_tpu.eval.inception_score import InceptionScorer

    num_classes = 1000 if args.general else 51
    variables = random_inception_variables(jax.random.PRNGKey(0), num_classes)
    if args.checkpoint_dir:
        tf_vars = load_slim_checkpoint(args.checkpoint_dir, num_classes)
        variables = slim_vars_to_flax(tf_vars, variables)
    else:
        print('!! random inception weights: scores are relative-only')

    images = load_images(args.dir, args.limit)
    print('images:', len(images))
    scorer = InceptionScorer(variables, num_classes,
                             finetuned=not args.general)
    mean, std = scorer.score_images(images, args.splits)
    print('IS: %.4f +- %.4f' % (mean, std))

    if args.fid_stats:
        from text2img_ekl_tpu.eval.fid import FIDScorer
        fid_vars = random_inception_variables(jax.random.PRNGKey(0), 1000)
        fs = FIDScorer(fid_vars)
        print('FID: %.4f' % fs.fid_against_stats(np.stack(images),
                                                 args.fid_stats))


if __name__ == '__main__':
    main()
