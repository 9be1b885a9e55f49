"""Microbenchmark: split-K weight-gradient conv vs XLA's stock dW.

The profiled 3-stage tail (PERF.md round-3 profile) is dominated by
weight-gradient convs with tiny outputs and enormous contractions
(dW[3,3,C,F] = sum over B*H*W ~ 4.2M elements at h_net3): 12% MXU / 29%
HBM — neither-bound, serialization-limited. The Pallas streaming-dW
rewrite was measured and rejected (in-VMEM tap-stacking swamps the MXU
stationarity win, PERF.md "Pallas streaming-dW kernel").

This is the GRAPH-level attempt at the same tail: split the reduction
K ways over the batch (dW = sum_k dW_k), so XLA sees K independent
contractions with K-times-smaller reduce depth and a K-times-larger
parallel output (k*C fills the MXU N dim the lone C=32 underfills),
plus one cheap [K,3,3,C,F] sum. The standard split-K trick from GPU
GEMM land, expressed as a jax.vmap so XLA picks the lowering.

Run on the real chip: python tools/bench_dw_splitk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from text2img_ekl_tpu.ops.conv_dw import dw3x3_xla

SHAPES = [
    ("hnet3_up_bs64", (64, 256, 256, 32, 32)),
    ("hnet3_res_bs64", (64, 128, 128, 32, 64)),
    ("hnet2_up_bs64", (64, 128, 128, 64, 64)),
    ("hnet2_up_bs128", (128, 128, 128, 64, 64)),
]


def dw_splitk_batch(x, dy, k):
    """Partial dWs over K batch chunks, summed."""
    b = x.shape[0]
    xs = x.reshape(k, b // k, *x.shape[1:])
    dys = dy.reshape(k, b // k, *dy.shape[1:])
    return jax.vmap(dw3x3_xla)(xs, dys).sum(0)


def dw_splitk_rows(x, dy, k):
    """Partial dWs over K row bands (needs a 1-row halo on each side for
    the 3x3 window; interior bands contract over the halo'd slab)."""
    b, h, w, c = x.shape
    f = dy.shape[-1]
    band = h // k
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    def one(i):
        xs = jax.lax.dynamic_slice_in_dim(xp, i * band, band + 2, axis=1)
        dys = jax.lax.dynamic_slice_in_dim(dy, i * band, band, axis=1)
        # VALID padding on rows (halo provided), SAME on cols
        out = jax.lax.conv_general_dilated(
            xs.transpose(3, 1, 2, 0), dys.transpose(1, 2, 0, 3),
            window_strides=(1, 1), padding=((0, 0), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        return out.transpose(1, 2, 0, 3)

    return sum(one(i) for i in range(k))


def timed(fn, *args, iters=20):
    float(jnp.sum(fn(*args)))  # compile+sync (block_until_ready no-ops)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    ks = [int(t) for t in os.environ.get("DW_K", "2,4,8,16").split(",")]
    print("backend:", jax.default_backend(), "K:", ks)
    rng = np.random.RandomState(0)
    for name, (B, H, W, C, F) in SHAPES:
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        dy = jnp.asarray(rng.randn(B, H, W, F), jnp.bfloat16)
        xla = jax.jit(dw3x3_xla)
        t_x = timed(xla, x, dy)
        a = np.asarray(xla(x, dy), np.float32)
        line = f"{name}: xla {t_x*1e3:.3f} ms"
        for k in ks:
            for tag, f_ in [("kb", dw_splitk_batch), ("kr", dw_splitk_rows)]:
                if tag == "kb" and B % k:
                    continue
                if tag == "kr" and H % k:
                    continue
                jf = jax.jit(lambda x, dy, f_=f_, k=k: f_(x, dy, k))
                t_p = timed(jf, x, dy)
                b_ = np.asarray(jf(x, dy), np.float32)
                rel = float(np.max(np.abs(a - b_)) /
                            (np.max(np.abs(a)) + 1e-9))
                line += (f"  | {tag}{k} {t_p*1e3:.3f} ms "
                         f"({t_x/t_p:.2f}x, err {rel:.1e})")
        print(line, flush=True)


if __name__ == "__main__":
    main()
