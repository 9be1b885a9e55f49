#!/usr/bin/env python
"""IS (and optional FID vs precomputed stats) over a sample directory.

Equivalent of the reference driver scripts is.py / is_of_dir.py
(reference: is.py:11-89, is_of_dir.py) as a proper CLI instead of
edit-the-source scripts:

    python is_of_dir.py --dir eval/Testset_... [--checkpoint_dir CKPT]
        [--general --pb classify_image_graph_def.pb] [--fid_stats stats.npz]

Weight sources (reference-comparable scores require one):
  * fine-tuned IS (default): --checkpoint_dir, the TF-slim 50+1-class
    checkpoint (reference inception_score.py:43-45),
  * general IS (--general): --pb, the frozen 2015 ImageNet graph
    (reference inception_score_general.py:56-99) — 1008-way softmax,
    frozen-graph preprocessing,
  * the FID branch (--fid_stats) always uses the frozen graph (--pb /
    $T2I_FID_PB), like reference fid.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--dir', required=True)
    ap.add_argument('--checkpoint_dir', default='',
                    help='TF-slim fine-tuned checkpoint (51-class IS)')
    ap.add_argument('--pb', default=os.environ.get('T2I_FID_PB', ''),
                    help='frozen 2015 graph for --general IS and the FID '
                         'branch; defaults to $T2I_FID_PB')
    ap.add_argument('--fid_stats', default='',
                    help='precomputed .npz real-set statistics')
    ap.add_argument('--splits', type=int, default=10)
    ap.add_argument('--limit', type=int, default=0)
    ap.add_argument('--general', action='store_true')
    args = ap.parse_args(argv)
    if args.general and args.checkpoint_dir:
        ap.error('--general uses the frozen pb (--pb), not a slim '
                 'checkpoint; drop --checkpoint_dir')

    import jax
    from inception_score import load_images
    from text2img_ekl_tpu.eval.convert_tf import (
        load_slim_checkpoint, random_inception_variables, slim_vars_to_flax)
    from text2img_ekl_tpu.eval.inception_score import InceptionScorer

    have_pb = args.pb and os.path.exists(args.pb)
    if args.general:
        if have_pb:
            scorer = InceptionScorer.from_frozen_pb(args.pb)
        else:
            # honest random fallback in the same flavor the real path uses
            variables = random_inception_variables(
                jax.random.PRNGKey(0), 1008, flavor='fid')
            scorer = InceptionScorer(variables, 1008, finetuned=False,
                                     flavor='fid')
            print('!! random inception weights (no --pb): general IS is '
                  'relative-only')
    else:
        variables = random_inception_variables(jax.random.PRNGKey(0), 51)
        if args.checkpoint_dir:
            tf_vars = load_slim_checkpoint(args.checkpoint_dir, 51)
            variables = slim_vars_to_flax(tf_vars, variables)
        else:
            print('!! random inception weights: scores are relative-only')
        scorer = InceptionScorer(variables, 51, finetuned=True)

    images = load_images(args.dir, args.limit)
    print('images:', len(images))
    mean, std = scorer.score_images(images, args.splits)
    print('IS: %.4f +- %.4f' % (mean, std))

    if args.fid_stats:
        from fid import make_scorer
        fs = make_scorer(args.pb)
        print('FID: %.4f' % fs.fid_against_stats(np.stack(images),
                                                 args.fid_stats))


if __name__ == '__main__':
    main()
