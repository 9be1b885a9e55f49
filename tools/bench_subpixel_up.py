"""Microbenchmark: nearest-2x upsample + conv3x3 vs the subpixel rewrite.

The UpBlock computes conv3x3(up2x(x)) — the conv reads a 4x-materialized
input. Exact alternative: fold the upsample into the weights. For output
parity (di, dj) in {0,1}^2 the nearest-upsampled window collapses onto a
2x2 neighbourhood of the original pixels with partial-sum taps:

  row taps  di=0: {offset -1: W[0],    offset 0: W[1]+W[2]}
            di=1: {offset  0: W[0]+W[1], offset +1: W[2]}
  (columns identical) ->
  conv3x3(up2x(x), W) == depth_to_space(conv3x3(x, W4), 2)

with W4[:, :, :, 4F] built from 2D partial sums of W placed at the right
3x3 offsets (zero row/col for the unused offset). This reads x once
(instead of the 4x upsampled copy) at the cost of a depth-to-space
relayout on the output. This tool checks exactness and measures both
forms fwd and fwd+bwd at the flagship h_net2 shapes.

  python tools/bench_subpixel_up.py [--bs 128]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_w4(W):
    """(3,3,C,F) -> (3,3,C,4F) with parity blocks [di*2+dj] stacked.
    The shipped builder (blocks.fold_up2x_kernel backs TPU_SUBPIXEL_UP)."""
    from text2img_ekl_tpu.nn.blocks import fold_up2x_kernel
    return fold_up2x_kernel(W)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bs', type=int, default=128)
    ap.add_argument('--h', type=int, default=64, help='input spatial size')
    ap.add_argument('--c', type=int, default=64, help='input channels')
    ap.add_argument('--f', type=int, default=128, help='output channels')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from text2img_ekl_tpu.nn.blocks import upsample_nearest_2x

    B, H, C, F = args.bs, args.h, args.c, args.f
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, (B, H, H, C), jnp.bfloat16)
    W = jax.random.normal(kw, (3, 3, C, F), jnp.float32) * 0.05

    dn = ('NHWC', 'HWIO', 'NHWC')

    def baseline(x, W, precision=None):
        up = upsample_nearest_2x(x)
        return jax.lax.conv_general_dilated(
            up, W.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, precision=precision)

    def subpixel(x, W, precision=None):
        f = W.shape[-1]
        W4 = build_w4(W).astype(x.dtype)
        y4 = jax.lax.conv_general_dilated(
            x, W4, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            precision=precision)
        b, h, w, _ = y4.shape
        y = y4.reshape(b, h, w, 2, 2, f).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, 2 * h, 2 * w, f)

    # exactness (f32 at HIGHEST precision — the TPU's default f32 conv
    # runs on the bf16 MXU, which would mask the structural comparison)
    hp = jax.lax.Precision.HIGHEST
    xs = jax.random.normal(kx, (2, 8, 8, 4), jnp.float32)
    Ws = jax.random.normal(kw, (3, 3, 4, 6), jnp.float32)
    np.testing.assert_allclose(np.asarray(baseline(xs, Ws, hp)),
                               np.asarray(subpixel(xs, Ws, hp)),
                               rtol=1e-5, atol=1e-5)
    print('parity OK')

    def bench(fn, tag):
        f = jax.jit(fn)
        y = f(x, W); _ = float(jnp.sum(y.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(30):
            y = f(x, W)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        fwd = (time.perf_counter() - t0) / 30

        def loss(x, W):
            y = fn(x, W)
            return jnp.sum((y.astype(jnp.float32)) ** 2)
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        gx, gw = g(x, W); _ = float(jnp.sum(gw))
        t0 = time.perf_counter()
        for _ in range(30):
            gx, gw = g(x, W)
        _ = float(jnp.sum(gw))
        bwd = (time.perf_counter() - t0) / 30
        print(f'{tag}: fwd {fwd*1e3:.2f} ms   fwd+bwd {bwd*1e3:.2f} ms')
        return gx, gw

    gx_b, gw_b = bench(baseline, 'baseline up2x+conv ')
    gx_s, gw_s = bench(subpixel, 'subpixel conv+d2s  ')
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_s),
                               rtol=2e-2, atol=1e-1)
    print('grad parity OK')


if __name__ == '__main__':
    main()
