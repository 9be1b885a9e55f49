"""Microbenchmark: Pallas dW kernel (ops/conv_dw.py) vs XLA's weight-grad conv.

Shapes are the profiled hot dW classes (PERF.md round-3 profile):
  * h_net3/upsample dW (3-stage, bs64):  x[64,256,256,32] dy[...,32] — 3.36 ms
  * h_net3 residual dWs (128px, C=32):   x[64,128,128,32] dy[...,64]
  * h_net2/upsample dW (3-stage, bs64):  x[64,128,128,64] dy[...,64] — 1.67 ms
  * flagship h_net2 class at bs128:      x[128,128,128,64] dy[...,64]

Run on the real chip: python tools/bench_dw.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from text2img_ekl_tpu.ops import conv_dw

SHAPES = [
    ("hnet3_up_bs64", (64, 256, 256, 32, 32)),
    ("hnet3_res_bs64", (64, 128, 128, 32, 64)),
    ("hnet2_up_bs64", (64, 128, 128, 64, 64)),
    ("hnet2_up_bs128", (128, 128, 128, 64, 64)),
]


def timed(fn, *args, iters=20):
    fn(*args).block_until_ready()
    # axon block_until_ready is a no-op: sync by pulling a scalar.
    float(jnp.sum(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    tiles = [int(t) for t in os.environ.get("DW_TILES", "0").split(",")]
    print("backend:", jax.default_backend(), "tiles:", tiles)
    rng = np.random.RandomState(0)
    for name, (B, H, W, C, F) in SHAPES:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        dy = jnp.asarray(rng.randn(B, H, W, F), jnp.bfloat16)
        xla = jax.jit(conv_dw.dw3x3_xla)
        t_x, _ = timed(xla, x, dy)
        a = np.asarray(xla(x, dy), np.float32)
        gb = (x.nbytes + dy.nbytes) / 1e9
        line = (f"{name}: xla {t_x*1e3:.3f} ms  "
                f"hbm-bound {gb/800*1e3:.2f} ms@800GB/s")
        for tile in tiles:
            if not conv_dw.dw_supported(H, W, C, F, tile):
                continue
            for tag, fn in [("v1", conv_dw.dw3x3), ("v2", conv_dw.dw3x3_v2)]:
                def pal(x, dy, fn=fn, tile=tile):
                    return fn(x, dy, tile=tile)
                t_p, _ = timed(pal, x, dy)
                b = np.asarray(pal(x, dy), np.float32)
                rel = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
                line += (f"  | {tag}/t{tile or conv_dw._tile_for(H, W)} "
                         f"{t_p*1e3:.3f} ms "
                         f"({t_x/t_p:.2f}x, err {rel:.1e})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
