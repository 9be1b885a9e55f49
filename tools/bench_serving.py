"""Throughput of the exported StableHLO serving artifact on the chip.

Exports the flagship eval sampler at BENCH_BS (default 128), deserializes
the blob (as a serving process would), and measures images/sec for the
top stage — device-resident timing (no host fetch in the loop; the final
sync fetches one value, the tunneled backend's only real barrier).

    python tools/bench_serving.py            # flagship, bs128
    BENCH_BS=256 python tools/bench_serving.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.io_utils.export_hlo import (load_serving,
                                                      make_serving_exported,
                                                      serving_cond_shapes)
    from text2img_ekl_tpu.models import build_generator

    bs = int(os.environ.get('BENCH_BS', 128))
    steps = int(os.environ.get('BENCH_STEPS', 30))
    cfg_name = os.environ.get('BENCH_CFG',
                              'birds_2stg_splitz_cap_ca.realcls.yml')
    cfg = cfg_from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'cfg',
        cfg_name))
    cfg.TEST.G_CAPSULE = cfg.TRAIN.G_CAPSULE
    cfg.TRAIN.BATCH_SIZE = bs
    G = build_generator(cfg, train_flag=False)

    import functools
    noise0 = jnp.zeros((bs, cfg.GAN.Z_DIM), jnp.float32)
    conds0 = [jnp.zeros(s.shape, s.dtype)
              for s in serving_cond_shapes(cfg, bs)]
    rngs = {'params': jax.random.PRNGKey(0),
            'reparam': jax.random.PRNGKey(1),
            'cls_prior': jax.random.PRNGKey(2)}
    t0 = time.perf_counter()
    gvars = jax.jit(functools.partial(G.init, train=True,
                                      method='init_all'))(
        rngs, noise0, *conds0)
    print('init: %.1fs' % (time.perf_counter() - t0), flush=True)

    tpu_only = os.environ.get('BENCH_TPU_ONLY', '') == '1'
    t0 = time.perf_counter()
    blob = make_serving_exported(cfg, G, gvars, bs,
                                 tpu_only=tpu_only).serialize()
    print('export+serialize (%s): %.1fs, %.1f MB'
          % ('tpu-only' if tpu_only else 'portable',
             time.perf_counter() - t0, len(blob) / 1e6), flush=True)
    fn = load_serving(blob)

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.normal(size=(bs, cfg.GAN.Z_DIM)), jnp.float32)
    conds = [jnp.asarray(rng.normal(size=s.shape), jnp.float32) * 0.3
             for s in serving_cond_shapes(cfg, bs)]
    key = jnp.asarray(np.array([3, 4], np.uint32))

    out = fn(key, noise, *conds)
    print('warm output', [tuple(o.shape) for o in out], flush=True)
    int(np.asarray(out[-1][0, 0, 0, 0]))  # sync (compile done)

    t0 = time.perf_counter()
    for i in range(steps):
        out = fn(key, noise, *conds)
    int(np.asarray(out[-1][0, 0, 0, 0]))  # sync by value fetch
    dt = time.perf_counter() - t0
    print('serving: %.1f img/s (bs%d, %d steps, %.2f ms/batch)'
          % (bs * steps / dt, bs, steps, dt / steps * 1e3), flush=True)


if __name__ == '__main__':
    main()
