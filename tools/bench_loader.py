#!/usr/bin/env python
"""Loader-throughput microbenchmark: native C++ batch decode vs PIL.

Fabricates CUB-sized JPEGs (500x375) plus the pickle/bbox metadata, then
measures TextDataset throughput through the DataLoader on both paths:

  python tools/bench_loader.py [--n 256] [--bs 32] [--branch 2]

Prints one JSON line per path with images/sec (the per-item 'imgs' count;
each item decodes TWO JPEGs — real + wrong — in training mode).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fabricate_cub(root: str, n: int) -> None:
    cub = os.path.join(root, 'CUB_200_2011')
    names = ['%03d.cls/img_%04d' % (i % 20, i) for i in range(n)]
    os.makedirs(cub, exist_ok=True)
    rng = np.random.default_rng(0)
    with open(os.path.join(cub, 'images.txt'), 'w') as f:
        for i, nm in enumerate(names):
            f.write('%d %s.jpg\n' % (i + 1, nm))
    with open(os.path.join(cub, 'bounding_boxes.txt'), 'w') as f:
        for i in range(n):
            f.write('%d 60 40 300 280\n' % (i + 1))
    for nm in names:
        p = os.path.join(cub, 'images', nm + '.jpg')
        os.makedirs(os.path.dirname(p), exist_ok=True)
        arr = rng.integers(0, 255, (375, 500, 3), dtype=np.uint8)
        Image.fromarray(arr).save(p, quality=90)
    split = os.path.join(root, 'train')
    os.makedirs(split, exist_ok=True)
    with open(os.path.join(split, 'filenames.pickle'), 'wb') as f:
        pickle.dump(names, f, protocol=2)
    emb = rng.standard_normal((n, 10, 1024)).astype(np.float32)
    with open(os.path.join(split, 'char-CNN-RNN-embeddings.pickle'),
              'wb') as f:
        pickle.dump(emb, f, protocol=2)
    with open(os.path.join(split, 'class_info.pickle'), 'wb') as f:
        pickle.dump([i % 20 + 1 for i in range(n)], f, protocol=2)


def run(root: str, n: int, bs: int, branch: int, native: bool,
        workers: int, uint8: bool = False) -> float:
    from text2img_ekl_tpu.data import DataLoader, TextDataset
    ds = TextDataset(root, 'train', base_size=64, branch_num=branch,
                     entity_dim=200, native_decode=native,
                     uint8_output=uint8)
    dl = DataLoader(ds, bs, shuffle=True, num_workers=workers)
    count = 0
    t0 = time.perf_counter()
    for batch in dl:
        count += batch['imgs'][0].shape[0]
    dt = time.perf_counter() - t0
    return count / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=256)
    ap.add_argument('--bs', type=int, default=32)
    ap.add_argument('--branch', type=int, default=2)
    ap.add_argument('--workers', type=int, default=4)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, 'birds')
        fabricate_cub(root, args.n)
        # warm both paths once (native lib build, page cache)
        run(root, args.n, args.bs, args.branch, native=False, workers=args.workers)
        for native, uint8 in ((False, False), (True, False),
                              (False, True), (True, True)):
            ips = run(root, args.n, args.bs, args.branch, native=native,
                      workers=args.workers, uint8=uint8)
            print(json.dumps({
                'metric': 'loader_items_per_sec',
                'path': ('native' if native else 'pil')
                + ('+uint8' if uint8 else ''),
                'value': round(ips, 1), 'bs': args.bs,
                'branch_num': args.branch}))


if __name__ == '__main__':
    main()
