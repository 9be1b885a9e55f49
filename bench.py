#!/usr/bin/env python
"""Benchmark: flagship CUB train step throughput on the local accelerator.

Runs the fused G+D train step for the flagship config
(birds_2stg_splitz_cap_ca.realcls.yml: 64+128px stages, capsule G head,
capsule D classifier, split-z CA conditioning, EKL class losses) on
synthetic data, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline anchor: the reference trains CUB at ~37 images/sec/GPU (bs24,
4 min/epoch over 8,855 images on one GPU; reference main.py:157-161,
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

# The persistent XLA compilation cache is DEFAULT-ON for the bench (round-3
# lesson: the flagship metric must be capturable inside a fixed driver
# timeout — cold fused-step compile is ~7m24s on the tunneled backend, warm
# ~1m21s; PERF.md "Compilation cache"). T2I_JAX_CACHE still overrides, and
# BENCH_COLD=1 disables the cache to measure true compile times.
if os.environ.get('BENCH_COLD') != '1':
    os.environ.setdefault('T2I_JAX_CACHE',
                          os.path.join(_REPO, '.jax_cache_tpu'))

BASELINE_IMAGES_PER_SEC = 37.0


def _watchdog():
    """Run the bench in a child process with a per-attempt timeout and ONE
    retry. Observed on the tunneled axon backend (round 4): a run can
    wedge indefinitely waiting on the remote service while a fresh
    process succeeds in minutes — and a wedged bench run means the
    round's headline metric is silently lost to the driver's timeout.
    BENCH_WATCHDOG=0 disables; BENCH_ATTEMPT_TIMEOUT overrides both
    attempts' budgets."""
    import subprocess

    # Attempt 1 gets a short budget (kills a wedge fast); attempt 2 gets
    # one long enough for a genuinely COLD fused-step compile (~7.5 min,
    # a single jit whose cache entry only lands on completion — an
    # interrupted cold compile does NOT resume warm, only the small init
    # jits do).
    env_budget = os.environ.get('BENCH_ATTEMPT_TIMEOUT')
    budgets = ([float(env_budget)] * 2 if env_budget else [360.0, 900.0])
    env = dict(os.environ, BENCH_INNER='1')
    for attempt, budget in enumerate(budgets, 1):
        try:
            proc = subprocess.run([sys.executable] + sys.argv,
                                  env=env, timeout=budget)
            sys.exit(proc.returncode)
        except subprocess.TimeoutExpired:
            print('bench attempt %d exceeded %.0fs (wedged backend?); '
                  '%s' % (attempt, budget,
                          'retrying once' if attempt < len(budgets)
                          else 'giving up'),
                  file=sys.stderr, flush=True)
    sys.exit(1)


def main():
    import jax
    import numpy as np

    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    cfg_name = os.environ.get('BENCH_CFG',
                              'birds_2stg_splitz_cap_ca.realcls.yml')
    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'cfg', cfg_name)
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join('/root/reference/cfg', cfg_name)
    cfg = cfg_from_file(cfg_path)
    # 128/chip saturates the v5e on this workload (see PERF notes); the
    # reference metric is per-chip throughput, batch size is free.
    bs = int(os.environ.get('BENCH_BS', 128))
    # The bench measures the SHIPPED default config (TPU_BN_DTYPE is
    # bfloat16 by default since round 3 — no silent opt-in here); override
    # via BENCH_BN_DTYPE to A/B the f32 BN variant.
    if os.environ.get('BENCH_BN_DTYPE'):
        cfg.TPU_BN_DTYPE = os.environ['BENCH_BN_DTYPE']
    if os.environ.get('BENCH_FUSED_BN_GLU'):
        cfg.TPU_FUSED_BN_GLU = os.environ['BENCH_FUSED_BN_GLU'] == '1'
    if os.environ.get('BENCH_SUBPIXEL_UP'):
        cfg.TPU_SUBPIXEL_UP = os.environ['BENCH_SUBPIXEL_UP'] == '1'
    if os.environ.get('BENCH_REMAT_G') is not None:
        cfg.TPU_REMAT_G = os.environ['BENCH_REMAT_G']
    if os.environ.get('BENCH_GROUPED_D'):
        cfg.TPU_GROUPED_D = os.environ['BENCH_GROUPED_D'] == '1'
    if os.environ.get('BENCH_PALLAS_DW'):
        cfg.TPU_PALLAS_DW = os.environ['BENCH_PALLAS_DW'] == '1'
    if os.environ.get('BENCH_GRAD_ACCUM'):
        cfg.TPU_GRAD_ACCUM = int(os.environ['BENCH_GRAD_ACCUM'])
    if os.environ.get('BENCH_EMA'):
        cfg.TPU_EMA_DECAY = float(os.environ['BENCH_EMA'])
    cfg.TRAIN.BATCH_SIZE = bs
    steps = int(os.environ.get('BENCH_STEPS', 30))

    n_chips = len(jax.devices())
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, G, Ds, rng, cond_code_width(cfg),
                               mesh=mesh)
    step_fn = make_train_step(cfg, G, Ds, mesh)

    B = bs * n_chips
    batch = shard_batch(mesh, make_synthetic_batch(cfg, B))

    # warmup/compile; sync via value fetch (block_until_ready does not
    # actually block on the tunneled axon backend)
    tc = time.perf_counter()
    state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['errG']))
    compile_s = time.perf_counter() - tc

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(2 + i))
    assert np.isfinite(float(metrics['errG']))
    dt = time.perf_counter() - t0

    imgs_per_sec = B * steps / dt
    per_chip = imgs_per_sec / n_chips
    flagship = cfg_name == 'birds_2stg_splitz_cap_ca.realcls.yml'
    result = {
        # the canonical flagship metric name is stable regardless of HOW
        # the flagship config was selected; the 37 img/s anchor is the
        # flagship CUB workload's, so vs_baseline is null for any other
        # config (a ratio against it would be meaningless).
        'metric': 'cub_flagship_train_images_per_sec_per_chip'
        if flagship else f'train_images_per_sec_per_chip[{cfg_name}]',
        'value': round(per_chip, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(per_chip / BASELINE_IMAGES_PER_SEC, 3)
        if flagship else None,
        # cold-vs-warm visibility: warm cache entries make this ~seconds,
        # a cache miss shows the full fused-step compile time
        'compile_s': round(compile_s, 1),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    # BENCH_COLD runs measure true compile time — a fixed attempt budget
    # would kill them mid-compile, so the watchdog stands down.
    if (os.environ.get('BENCH_WATCHDOG', '1') == '1'
            and os.environ.get('BENCH_INNER') != '1'
            and os.environ.get('BENCH_COLD') != '1'):
        _watchdog()
    main()
