"""Sweep backend-compiler options over the fused train step.

The per-op profile is a long tail (<2 ms per kernel, PERF.md), so the
remaining global lever is how the backend compiler schedules/fuses the
whole program. This loops candidate option sets in ONE process (each
trial pays a fresh remote AOT compile, ~minutes — amortize by
backgrounding the whole sweep), times steady-state steps, and prints a
table vs the no-options baseline. Unknown/rejected options are caught
and reported as SKIP, so speculative flags are safe to include.

  python tools/sweep_compiler_flags.py --bs 128 [--cfg ...] \
      [--trials trials.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Candidate sets. Names follow public XLA TPU debug options; anything the
# backend rejects is skipped at compile time and reported.
DEFAULT_TRIALS = [
    ('baseline', {}),
    ('lhs_off', {'xla_tpu_enable_latency_hiding_scheduler': 'false'}),
    ('rwb_fusion_off', {'xla_tpu_rwb_fusion': 'false'}),
    ('nested_loop_fusion',
     {'xla_tpu_enable_multi_level_nested_loop_fusion': 'true'}),
    ('no_dot_strength_red',
     {'xla_tpu_enable_dot_strength_reduction': 'false'}),
    ('aggressive_fusion',
     {'xla_tpu_enable_experimental_fusion_cost_model': 'true'}),
    ('bundle_cost_model',
     {'xla_tpu_use_bundle_aware_cost_model_for_fusions': 'true'}),
    ('licm_inflation',
     {'xla_tpu_licm_size_inflation_ratio': '2.0'}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    ap.add_argument('--bs', type=int, default=128)
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--trials', default='',
                    help='JSON file: [[name, {opt: val}], ...]')
    args = ap.parse_args()

    import jax

    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    trials = DEFAULT_TRIALS
    if args.trials:
        with open(args.trials) as f:
            trials = [(n, o) for n, o in json.load(f)]

    cfg = cfg_from_file(args.cfg)
    cfg.TRAIN.BATCH_SIZE = args.bs
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    batch = shard_batch(mesh, make_synthetic_batch(cfg, args.bs))

    results = []
    baseline_ms = None
    for name, opts in trials:
        cfg.TPU_COMPILER_OPTIONS = opts or None
        state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                   cond_code_width(cfg), mesh=mesh)
        try:
            step_fn = make_train_step(cfg, G, Ds, mesh)
            t_c0 = time.perf_counter()
            state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(1))
            errg = float(metrics['errG'])  # sync (block_until_ready no-op)
            compile_s = time.perf_counter() - t_c0
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, metrics, _ = step_fn(state, batch,
                                            jax.random.PRNGKey(2 + i))
            errg = float(metrics['errG'])
            ms = (time.perf_counter() - t0) / args.steps * 1e3
        except Exception as e:
            print('%-24s SKIP (%s)' % (name, str(e).splitlines()[0][:90]))
            results.append((name, None))
            continue
        if baseline_ms is None:
            baseline_ms = ms
        ips = args.bs / (ms / 1e3)
        print('%-24s %8.2f ms  %8.1f img/s  %+6.1f%%  (compile %.0fs, '
              'errG %.2f)' % (name, ms, ips,
                              100 * (baseline_ms / ms - 1), compile_s, errg))
        results.append((name, ms))
        del step_fn, state

    print()
    good = [(n, m) for n, m in results if m is not None]
    good.sort(key=lambda x: x[1])
    print('best: %s (%.2f ms)' % good[0] if good else 'no trials ran')


if __name__ == '__main__':
    main()
