"""Microbenchmark host<->device primitives on the tunneled TPU backend.

Times the building blocks the eval loop is made of, to attribute its
per-call overhead (PERF.md): H2D uploads of numpy args, eager ops,
jitted-call dispatch with device-resident vs numpy args, and D2H
fetches. Sync is always by fetching a value (block_until_ready is a
no-op here).

    python tools/bench_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(label, fn, n=20, sync=None):
    fn()  # warm
    if sync is not None:
        sync()
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    if sync is not None:
        sync()
    dt = (time.perf_counter() - t0) / n * 1e3
    print('%-44s %8.2f ms' % (label, dt))
    return out


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print('backend:', dev.platform, dev.device_kind)

    small = np.random.default_rng(0).standard_normal((64, 100)).astype(np.float32)
    med = np.random.default_rng(0).standard_normal((64, 1024)).astype(np.float32)
    big = np.random.default_rng(0).standard_normal((64, 128, 128, 3)).astype(np.float32)
    key = np.array([0, 1], np.uint32)

    dsmall = jnp.asarray(small)
    dmed = jnp.asarray(med)
    dbig = jnp.asarray(big)
    _ = float(jnp.sum(dbig))  # settle

    def syncv():
        return float(jnp.sum(dsmall))

    # H2D upload (async queue?) measured with and without sync
    timeit('H2D 25KB (jnp.asarray, no sync)', lambda: jnp.asarray(small))
    timeit('H2D 25KB + sync', lambda: float(jnp.sum(jnp.asarray(small))))
    timeit('H2D 256KB + sync', lambda: float(jnp.sum(jnp.asarray(med))))
    timeit('H2D 12MB + sync', lambda: float(jnp.sum(jnp.asarray(big))))

    # eager ops on device args
    timeit('eager split (no sync)', lambda: jax.random.split(jnp.asarray(key)))
    timeit('eager normal 25KB (no sync)',
           lambda: jax.random.normal(jnp.asarray(key), (64, 100)))
    timeit('eager slice dmed[:, :100] (no sync)', lambda: dmed[:, :100])

    # jitted call: device args vs numpy args
    @jax.jit
    def f(a, b, k):
        x = jnp.tanh(a @ jnp.ones((100, 64), a.dtype))
        return x + jax.random.normal(k, x.shape) + jnp.sum(b) * 0.0

    timeit('jit call, device args (no sync)', lambda: f(dsmall, dmed, jnp.asarray(key)))
    timeit('jit call, device args + sync', lambda: float(jnp.sum(f(dsmall, dmed, jnp.asarray(key)))))
    timeit('jit call, numpy args (no sync)', lambda: f(small, med, key))
    timeit('jit call, numpy args + sync', lambda: float(jnp.sum(f(small, med, key))))

    # D2H fetch
    timeit('D2H 25KB (np.asarray)', lambda: np.asarray(dsmall))
    timeit('D2H 12MB (np.asarray)', lambda: np.asarray(dbig))


if __name__ == '__main__':
    main()
