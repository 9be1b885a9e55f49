#!/usr/bin/env python
"""Standalone FID between two paths (dirs of images or .npz stats).

TPU-native equivalent of the reference FID CLI (reference: fid.py:238-250):

    python fid.py path_generated path_real_or_npz --pb classify_image_graph_def.pb

Each path is an image directory or a precomputed .npz with mu/sigma
(reference: fid.py:208-219). Activations run on the accelerator via the JAX
InceptionV3; sqrtm on host via scipy, as the reference does.

Reference-comparable numbers REQUIRE the frozen 2015 graph weights
(``--pb`` or $T2I_FID_PB): the scorer then uses the converted
classify_image_graph_def.pb weights and that graph's exact semantics
(mixed_10 max pool, legacy bilinear resize, (x-128)/128). Without it, a
random-weight tower is used and FID is relative-only.
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


def make_scorer(pb_path: str, batch_size: int = 50):
    """FIDScorer from the frozen graph when available, else random
    weights with a loud warning + download hint (the reference
    auto-downloads the tarball, fid.py:190-206; this environment cannot)."""
    import jax
    from text2img_ekl_tpu.eval.convert_tf import (
        FROZEN_PB_NAME, FROZEN_PB_URL, random_inception_variables)
    from text2img_ekl_tpu.eval.fid import FIDScorer

    if pb_path and (os.path.exists(pb_path) or
                    os.path.exists(os.path.join(pb_path, FROZEN_PB_NAME))):
        if os.path.isdir(pb_path):
            pb_path = os.path.join(pb_path, FROZEN_PB_NAME)
        print('FID inception weights: %s' % pb_path)
        return FIDScorer.from_frozen_pb(pb_path, batch_size)
    print('!! inception weights are RANDOM — FID is relative-only.\n'
          '   For reference-comparable FID download %s\n'
          '   and pass --pb path/to/%s (or set $T2I_FID_PB).'
          % (FROZEN_PB_URL, FROZEN_PB_NAME))
    variables = random_inception_variables(jax.random.PRNGKey(0), 1000)
    return FIDScorer(variables, batch_size=batch_size)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('path', nargs=2,
                    help='image dirs or .npz statistics files')
    ap.add_argument('--pb', default=os.environ.get('T2I_FID_PB', ''),
                    help='classify_image_graph_def.pb (file or its dir); '
                         'defaults to $T2I_FID_PB')
    ap.add_argument('--batch', type=int, default=50)
    ap.add_argument('--save_stats', default='',
                    help='save first path stats to this .npz and exit')
    args = ap.parse_args(argv)

    from text2img_ekl_tpu.eval.fid import calculate_frechet_distance

    scorer = make_scorer(args.pb, args.batch)
    mu1, s1 = _handle_path(args.path[0], scorer)
    if args.save_stats:
        np.savez(args.save_stats, mu=mu1, sigma=s1)
        print('saved stats to', args.save_stats)
        return
    mu2, s2 = _handle_path(args.path[1], scorer)
    print('FID:', calculate_frechet_distance(mu1, s1, mu2, s2))


if __name__ == '__main__':
    main()
