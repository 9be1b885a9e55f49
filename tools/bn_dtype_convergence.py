"""Loss-trajectory comparison: BatchNorm IO dtype f32 vs bf16.

bench.py opts into TPU_BN_DTYPE=bfloat16 (+14% step time) while the
shipped default stays float32 (reference-faithful). This tool provides the
evidence that the opt-in is benign: same seed, same synthetic data, N
steps with each dtype; prints the errG/errD trajectories side by side and
their relative drift.

  python tools/bn_dtype_convergence.py [--steps 200] [--bs 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(bn_dtype: str, steps: int, bs: int, log_every: int):
    import jax

    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    cfg = cfg_from_file('cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    cfg.TPU_BN_DTYPE = bn_dtype
    cfg.TRAIN.BATCH_SIZE = bs
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg), mesh=mesh)
    step_fn = make_train_step(cfg, G, Ds, mesh)

    batch = shard_batch(mesh, make_synthetic_batch(cfg, bs))

    traj = []
    for i in range(steps):
        state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(100 + i))
        if i % log_every == 0 or i == steps - 1:
            traj.append((i, float(metrics['errG']), float(metrics['errD'])))
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=200)
    ap.add_argument('--bs', type=int, default=64)
    ap.add_argument('--log_every', type=int, default=20)
    args = ap.parse_args()

    t32 = run('float32', args.steps, args.bs, args.log_every)
    t16 = run('bfloat16', args.steps, args.bs, args.log_every)
    print(f'{"step":>6} {"errG f32":>10} {"errG bf16":>10} {"rel":>8} '
          f'{"errD f32":>10} {"errD bf16":>10} {"rel":>8}')
    for (i, g32, d32), (_, g16, d16) in zip(t32, t16):
        rg = abs(g16 - g32) / max(abs(g32), 1e-6)
        rd = abs(d16 - d32) / max(abs(d32), 1e-6)
        print(f'{i:6d} {g32:10.3f} {g16:10.3f} {rg:8.2%} '
              f'{d32:10.3f} {d16:10.3f} {rd:8.2%}')


if __name__ == '__main__':
    main()
