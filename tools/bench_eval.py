"""Benchmark the offline sampling path (the TEST.SAMPLE_NUM protocol,
reference cub_trainer_splitz_cap_ca.py:776-911): images/sec through
``trainer.evaluate`` on synthetic data, split into device sampling vs
host PNG writing.

Usage (real TPU, background it — first compile is minutes):
    python tools/bench_eval.py --bs 64 --batches 8
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default='cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    ap.add_argument('--bs', type=int, default=64)
    ap.add_argument('--batches', type=int, default=8)
    ap.add_argument('--eval_mode', action='store_true',
                    help='BN running averages (TEST.EVAL_MODE)')
    args = ap.parse_args()

    from text2img_ekl_tpu.config import cfg_from_file
    import text2img_ekl_tpu.train.trainer as trainer_mod
    from text2img_ekl_tpu.train.state import create_train_state

    cfg = cfg_from_file(args.cfg)
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TRAIN.FLAG = False
    cfg.TRAIN.BATCH_SIZE = args.bs
    cfg.TEST.EVAL_MODE = bool(args.eval_mode)
    cfg.TEST.B_EXAMPLE = False

    out_dir = tempfile.mkdtemp(prefix='bench_eval_')
    tr = trainer_mod.CondGANTrainer(cfg, out_dir)

    import jax
    state = create_train_state(cfg, tr.G, tr.Ds, jax.random.PRNGKey(0),
                               tr.cond_width, mesh=tr.mesh)

    def run(save: bool, batches: int):
        """One evaluate pass over `batches`; returns (seconds, images)."""
        real_save = trainer_mod.save_single_images
        n_saved = [0]
        if not save:
            def _noop(images, *a, **kw):
                n_saved[0] += len(images)
            trainer_mod.save_single_images = _noop
        try:
            t0 = time.time()
            tr.evaluate('test', state=state, max_batches=batches)
            dt = time.time() - t0
        finally:
            trainer_mod.save_single_images = real_save
        return dt, batches * args.bs * 10  # 10 captions per item

    # warmup/compile
    run(save=False, batches=1)
    t_nosave, n = run(save=False, batches=args.batches)
    t_save, _ = run(save=True, batches=args.batches)

    # Direct scoring path (TPU_EVAL_DIRECT): sample -> IS predictions in
    # place, no PNG encode/decode and no per-image host fetch. Each
    # evaluate() call rebuilds the scorer (tower init + trace), a fixed
    # cost the 30k-image protocol amortizes to nothing — report the
    # MARGINAL rate (t(N) - t(1) over the extra images) so the steady
    # state is what's quoted.
    cfg.TPU_EVAL_DIRECT = True
    run(save=True, batches=1)  # warmup: inception tower compile
    t_direct_1, _ = run(save=True, batches=1)
    t_direct, _ = run(save=True, batches=args.batches)
    cfg.TPU_EVAL_DIRECT = False
    if args.batches > 1:
        n_marg = (args.batches - 1) * args.bs * 10
        rate_direct = n_marg / max(t_direct - t_direct_1, 1e-9)
    else:
        # no marginal sample at a single batch; quote the total rate
        rate_direct = n / t_direct

    direct_kind = ('marginal' if args.batches > 1
                   else 'total incl. scorer setup')
    print('sampling only : %6.2f s  %8.1f imgs/s' % (t_nosave, n / t_nosave))
    print('with PNG save : %6.2f s  %8.1f imgs/s' % (t_save, n / t_save))
    print('direct scoring: %6.2f s  %8.1f imgs/s %s '
          '(sample -> IS, no disk)'
          % (t_direct, rate_direct, direct_kind))
    print('host write tax: %6.2f s (%.0f%% of total)'
          % (t_save - t_nosave, 100 * (t_save - t_nosave) / max(t_save, 1e-9)))


if __name__ == '__main__':
    main()
