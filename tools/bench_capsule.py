"""Microbenchmark for the capsule routing kernels at flagship shapes.

Run on the real TPU:  python tools/bench_capsule.py [--bwd]

Flagship generator head (models/generator.py CondInitStageGWithCap):
x [B, 48, 8], weight [1024, 32, 8], 3 routing iterations.
Sync is by value fetch (jax.block_until_ready is a no-op on the axon
backend — PERF.md pitfall 2).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # compile+sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bwd', action='store_true')
    ap.add_argument('--batch', type=int, default=128)
    ap.add_argument('--shape', type=str, default='48,8,1024,32',
                    help='in_caps,in_length,out_caps,out_length')
    ap.add_argument('--variants', action='store_true',
                    help='bench experimental blocked kernels')
    ap.add_argument('--vmem_mb', type=int, default=None)
    args = ap.parse_args()
    in_caps, in_len, out_caps, out_len = map(int, args.shape.split(','))
    B = args.batch

    from text2img_ekl_tpu.ops.capsule import compute_votes, dynamic_routing
    from text2img_ekl_tpu.ops.capsule_pallas import capsule_linear_pallas

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, in_caps, in_len), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1),
                          (out_caps, out_len, in_len), jnp.float32) * 0.1

    xla = jax.jit(lambda x, w: dynamic_routing(compute_votes(x, w), 3))
    pal = jax.jit(lambda x, w: capsule_linear_pallas(x, w, 3))

    # parity first
    a, b = xla(x, w), pal(x, w)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    print(f'fwd parity rel-err: {err:.2e}')
    assert err < 2e-3, err

    if args.variants:
        import capsule_variants as cv
        for nb, mb in ((8, 64), (8, 100)):
            try:
                f = jax.jit(functools.partial(cv.forward_stored, nb=nb,
                                              vmem_mb=mb))
                e = float(jnp.max(jnp.abs(f(x, w) - a))
                          / (jnp.max(jnp.abs(a)) + 1e-12))
                print(f'stored NB={nb} vmem={mb}MB: rel-err {e:.2e}, '
                      f'{timeit(f, x, w):7.2f} ms')
            except Exception as ex:
                print(f'stored NB={nb} vmem={mb}MB: FAILED '
                      f'{type(ex).__name__}: {str(ex)[:120]}')
        for nb, mb in ((2, 32), (4, 48)):
            try:
                f = jax.jit(functools.partial(cv.forward_seq, nb=nb,
                                              vmem_mb=mb))
                e = float(jnp.max(jnp.abs(f(x, w) - a))
                          / (jnp.max(jnp.abs(a)) + 1e-12))
                print(f'seq NB={nb}: rel-err {e:.2e}, '
                      f'{timeit(f, x, w):7.2f} ms')
            except Exception as ex:
                print(f'seq NB={nb}: FAILED {type(ex).__name__}: '
                      f'{str(ex)[:120]}')
        for nb in (8, 16, 32):
            try:
                f = jax.jit(functools.partial(cv.forward_recompute, nb=nb))
                e = float(jnp.max(jnp.abs(f(x, w) - a))
                          / (jnp.max(jnp.abs(a)) + 1e-12))
                print(f'recompute NB={nb}: rel-err {e:.2e}, '
                      f'{timeit(f, x, w):7.2f} ms')
            except Exception as ex:
                print(f'recompute NB={nb}: FAILED {type(ex).__name__}: '
                      f'{str(ex)[:160]}')
        print(f'shipped Pallas fwd B={B}: {timeit(pal, x, w):7.2f} ms')
        return

    if args.bwd:
        def loss_x(f):
            return jax.jit(jax.grad(lambda x, w: jnp.sum(f(x, w) ** 2),
                                    argnums=(0, 1)))
        gx = loss_x(lambda x, w: capsule_linear_pallas(x, w, 3))
        gr = loss_x(lambda x, w: dynamic_routing(compute_votes(x, w), 3))
        print(f'XLA fwd+bwd  B={B}: {timeit(gr, x, w):7.2f} ms')
        print(f'Pallas f+bwd B={B}: {timeit(gx, x, w):7.2f} ms')
    else:
        print(f'XLA fwd    B={B}: {timeit(xla, x, w):7.2f} ms')
        print(f'Pallas fwd B={B}: {timeit(pal, x, w):7.2f} ms')


if __name__ == '__main__':
    main()
