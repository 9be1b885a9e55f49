"""Export a trained generator as a portable StableHLO serving artifact.

    python tools/export_serving.py --cfg cfg/birds_2stg_splitz_cap_ca.realcls.yml \
        --net_g output/.../Model/ckpt_000123 --bs 32 --out sampler.stablehlo

--net_g accepts an orbax checkpoint dir OR a reference netG .pth (same
dual path as TRAIN.NET_G resume). The artifact bakes the weights in as
constants; serving needs only `jax.export.deserialize(blob).call` — see
io_utils/export_hlo.py for the input signature.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', required=True)
    ap.add_argument('--net_g', required=True,
                    help='orbax checkpoint dir or reference netG .pth')
    ap.add_argument('--bs', type=int, default=32)
    ap.add_argument('--out', required=True)
    ap.add_argument('--cpu', action='store_true',
                    help='export on the CPU backend (artifact is '
                         'backend-portable either way)')
    ap.add_argument('--gf_dim', type=int, default=0,
                    help='override GAN.GF_DIM (must match the checkpoint)')
    ap.add_argument('--df_dim', type=int, default=0,
                    help='override GAN.DF_DIM (must match the checkpoint)')
    ap.add_argument('--tpu_only', action='store_true',
                    help='keep the Pallas capsule kernels (artifact then '
                         'runs on TPU only; default is a portable cpu+tpu '
                         'blob using the pure-JAX capsule path)')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.io_utils.export_hlo import (make_serving_exported,
                                                      serving_cond_shapes)
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.train import create_train_state
    from text2img_ekl_tpu.train.step import cond_code_width

    cfg = cfg_from_file(args.cfg)
    if args.gf_dim:
        cfg.GAN.GF_DIM = args.gf_dim
    if args.df_dim:
        cfg.GAN.DF_DIM = args.df_dim
    # The checkpoint fixes the G architecture. Eval-flavor selection
    # (TEST.G_CAPSULE) defaults False, so a train config that never set
    # it would build a mismatched restore template — follow the
    # checkpoint's (train) flavor unless the yaml set TEST.G_CAPSULE
    # explicitly (as the reference's eval configs do).
    import yaml
    with open(args.cfg) as f:
        raw = yaml.safe_load(f) or {}
    if 'G_CAPSULE' not in (raw.get('TEST') or {}):
        cfg.TEST.G_CAPSULE = cfg.TRAIN.G_CAPSULE
    G = build_generator(cfg, train_flag=False)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg))
    if args.net_g.endswith('.pth'):
        from text2img_ekl_tpu.io_utils.torch_import import load_torch_generator
        gvars = load_torch_generator(
            args.net_g, {'params': state.g_params,
                         'batch_stats': state.g_batch_stats})
    else:
        # G-side-only: export configs (like eval configs) need not match
        # the training checkpoint's discriminator/optimizer trees
        from text2img_ekl_tpu.io_utils.checkpoint import (
            restore_generator_state)
        from text2img_ekl_tpu.train.state import eval_g_variables
        st = restore_generator_state(args.net_g, state)
        gvars = eval_g_variables(st, use_ema=cfg.TPU_EMA_EVAL)

    exported = make_serving_exported(cfg, G, gvars, args.bs,
                                     tpu_only=args.tpu_only)
    blob = exported.serialize()
    with open(args.out, 'wb') as f:
        f.write(blob)
    conds = serving_cond_shapes(cfg, args.bs)
    print('wrote %s (%.1f MB)' % (args.out, len(blob) / 1e6))
    print('inputs: key uint32[2], noise f32[%d,%d]%s'
          % (args.bs, cfg.GAN.Z_DIM,
             ''.join(', cond f32%s' % (tuple(c.shape),) for c in conds)))


if __name__ == '__main__':
    main()
