#!/usr/bin/env python
"""Kernel-level profile of the fused train step: top device ops by time.

Captures a jax.profiler trace of a few steady-state steps and aggregates
device-side op durations from the chrome trace (the recipe that works on
the tunneled axon backend — PERF.md), printing the top-K fusions with
their share of the step.

  python tools/profile_step.py --cfg cfg/birds_3stages.yml --bs 64 [--k 30]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_trace_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                      recursive=True)
    events = []
    for p in paths:
        with gzip.open(p, 'rt') as f:
            data = json.load(f)
        events.extend(data.get('traceEvents', []))
    return events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='cfg/birds_3stages.yml')
    ap.add_argument('--bs', type=int, default=64)
    ap.add_argument('--steps', type=int, default=6)
    ap.add_argument('--k', type=int, default=30)
    ap.add_argument('--bn_dtype', default='')
    args = ap.parse_args()

    import jax

    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    cfg = cfg_from_file(args.cfg)
    if args.bn_dtype:
        cfg.TPU_BN_DTYPE = args.bn_dtype
    cfg.TRAIN.BATCH_SIZE = args.bs
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg), mesh=mesh)
    step_fn = make_train_step(cfg, G, Ds, mesh)
    batch = shard_batch(mesh, make_synthetic_batch(cfg, args.bs))

    # compile + warm
    state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics['errG'])

    tdir = tempfile.mkdtemp(prefix='t2i_profile_')
    t0 = time.perf_counter()
    jax.profiler.start_trace(tdir)
    for i in range(args.steps):
        state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(2 + i))
    _ = float(metrics['errG'])
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / args.steps

    events = load_trace_events(tdir)
    # device op events carry 'dur' (us) and names like fusion.NNN /
    # convolution / convert_reduce_fusion etc; aggregate by stripped name
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        cat_args = e.get('args') or {}
        # keep only TPU op-level events (they carry run_id/hlo metadata on
        # this backend; host events have neither)
        name = e.get('name', '')
        if not ('fusion' in name or 'convolution' in name or 'copy' in name
                or 'reduce' in name or 'custom-call' in name
                or 'all-reduce' in name or name.startswith('%')
                or 'dynamic' in name or 'transpose' in name
                or 'scatter' in name or 'select' in name or 'add' in name
                or 'bitcast' in name or 'slice' in name):
            continue
        per_op[name] += e['dur']
        total += e['dur']
    steps_us = total / args.steps
    print('wall/step: %.1f ms; device op time/step: %.1f ms'
          % (wall * 1e3, steps_us / 1e3))
    print('%-52s %9s %6s' % ('op', 'ms/step', 'share'))
    for name, us in per_op.most_common(args.k):
        print('%-52s %9.3f %5.1f%%'
              % (name[:52], us / args.steps / 1e3, 100 * us / total))
    print('trace dir: %s' % tdir)


if __name__ == '__main__':
    main()
