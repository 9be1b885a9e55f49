"""Roofline diagnosis of the fused train step: MXU-bound or HBM-bound?

AOT-compiles the flagship step at the bench batch size and prints XLA's
cost analysis (FLOPs, bytes accessed) against v5e peaks, plus the measured
step time, to locate the bottleneck class before micro-optimizing.

  python tools/cost_analysis.py [--bs 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peaks (public spec): 197 TFLOP/s bf16, 394 TOP/s int8, 819 GB/s HBM
PEAK_BF16 = 197e12
PEAK_HBM = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=128)
    ap.add_argument('--cfg', default='cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    ap.add_argument('--bn_dtype', default='bfloat16')
    args = ap.parse_args()

    import jax

    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    cfg = cfg_from_file(args.cfg)
    cfg.TPU_BN_DTYPE = args.bn_dtype
    cfg.TRAIN.BATCH_SIZE = args.bs
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg), mesh=mesh)
    step_fn = make_train_step(cfg, G, Ds, mesh)

    B = args.bs
    batch = shard_batch(mesh, make_synthetic_batch(cfg, B))

    lowered = step_fn.lower(state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get('flops', float('nan'))
    bytes_acc = ca.get('bytes accessed', float('nan'))

    # measure through the jit cache, NOT the AOT object: executing a
    # lowered.compile() result directly is pathologically slow on the
    # tunneled axon backend (PERF.md), so the double compile is deliberate.
    state2, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics['errG'])
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state2, metrics, _ = step_fn(state2, batch, jax.random.PRNGKey(2 + i))
    _ = float(metrics['errG'])
    dt = (time.perf_counter() - t0) / n

    print(f'step time: {dt*1e3:.1f} ms  ({B/dt:.0f} img/s)')
    print(f'flops (XLA est): {flops/1e12:.3f} TFLOP '
          f'-> {flops/dt/1e12:.1f} TFLOP/s = {flops/dt/PEAK_BF16*100:.1f}% '
          f'of bf16 peak')
    print(f'bytes accessed (XLA est): {bytes_acc/1e9:.2f} GB '
          f'-> {bytes_acc/dt/1e9:.0f} GB/s = {bytes_acc/dt/PEAK_HBM*100:.1f}% '
          f'of HBM peak')
    for k in sorted(ca):
        if 'time' in k.lower():
            print(f'  {k}: {ca[k]:.4g}')


if __name__ == '__main__':
    main()
