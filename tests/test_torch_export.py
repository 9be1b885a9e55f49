"""Flax -> reference .pth export: roundtrip + strict load into the
reference's own modules.

Three layers of proof:
  * export -> torch_import roundtrip is bit-exact (the transforms are
    true inverses),
  * the exported state_dict loads into `/root/reference/model.py`'s
    COND_G_NET_CATZ_CA / JOINT_D_NET64 with ``strict=True`` (key set,
    shapes, and the DataParallel 'module.' prefix all match what the
    reference's load_network expects),
  * a JOINT_D forward on the loaded reference module matches our
    JointDNet on the same inputs (eval mode, running stats exported).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

from test_reference_step_parity import _install_stubs  # noqa: E402

REF = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, 'model.py')),
    reason='reference repo not mounted')


@pytest.fixture(scope='module')
def models():
    _install_stubs()
    old_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from miscc.config import cfg as rcfg
        import model as rmodel

        rcfg.CUDA = False
        rcfg.TEXT.DIMENSION = 12
        rcfg.GAN.EMBEDDING_DIM = 8
        rcfg.GAN.MANIFD_DIM = 8
        rcfg.GAN.Z_DIM = 8
        rcfg.GAN.GF_DIM = 16
        rcfg.GAN.DF_DIM = 16
        rcfg.GAN.ENTITY_DIM = 5
        rcfg.GAN.B_CONDITION = True
        rcfg.GAN.R_NUM = 2
        rcfg.TREE.BRANCH_NUM = 2
        rcfg.TREE.SCALE = 2
        rcfg.TRAIN.BATCH_SIZE = 4
        rcfg.TRAIN.CAT_Z = 'concat'

        from text2img_ekl_tpu.config import cfg_from_file
        from text2img_ekl_tpu.models import (build_discriminators,
                                             build_generator)
        from text2img_ekl_tpu.train import create_train_state
        from text2img_ekl_tpu.train.step import cond_code_width

        cfg = cfg_from_file(
            '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
        cfg.TEXT.DIMENSION = 12
        cfg.GAN.EMBEDDING_DIM = 8
        cfg.GAN.MANIFD_DIM = 8
        cfg.GAN.Z_DIM = 8
        cfg.GAN.GF_DIM = 16
        cfg.GAN.DF_DIM = 16
        cfg.GAN.ENTITY_DIM = 5
        cfg.GAN.R_NUM = 2
        cfg.TRAIN.BATCH_SIZE = 4
        cfg.TRAIN.D_CAPSULE = False
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_BN_DTYPE = 'float32'
        cfg.TPU_CAPSULE_PALLAS = False

        G = build_generator(cfg)
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(3),
                                   cond_code_width(cfg))
        gvars = {'params': state.g_params,
                 'batch_stats': state.g_batch_stats}
        dvars = {'params': state.d_params[0],
                 'batch_stats': state.d_batch_stats[0]}
        return dict(rmodel=rmodel, rcfg=rcfg, G=G, D=Ds[0],
                    gvars=gvars, dvars=dvars)
    finally:
        torch.Tensor.cuda = old_cuda


def _tree_equal(a, b):
    import flax
    fa = flax.traverse_util.flatten_dict(a)
    fb = flax.traverse_util.flatten_dict(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=str(k))


def test_generator_export_roundtrips(models):
    from text2img_ekl_tpu.io_utils.torch_export import flax_generator_to_torch
    from text2img_ekl_tpu.io_utils.torch_import import torch_generator_to_flax
    sd = flax_generator_to_torch(models['gvars'])
    back = torch_generator_to_flax(sd, models['gvars'])
    _tree_equal(models['gvars'], back)


def test_joint_d_export_roundtrips(models):
    from text2img_ekl_tpu.io_utils.torch_export import flax_joint_d_to_torch
    from text2img_ekl_tpu.io_utils.torch_import import torch_joint_d_to_flax
    sd = flax_joint_d_to_torch(models['dvars'], imsize=64)
    back = torch_joint_d_to_flax(sd, models['dvars'], imsize=64)
    _tree_equal(models['dvars'], back)


def test_generator_strict_load_into_reference(models):
    from text2img_ekl_tpu.io_utils.torch_export import flax_generator_to_torch
    rmodel, rcfg = models['rmodel'], models['rcfg']
    torch.manual_seed(0)
    old_cuda = torch.Tensor.cuda      # model.py:465 calls .cuda() in init
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        share_gs = rmodel.get_shareGs(rcfg.GAN.GF_DIM)
        netG = rmodel.COND_G_NET_CATZ_CA(
            rcfg.TEXT.DIMENSION, rcfg.GAN.ENTITY_DIM, share_gs,
            use_cap=True, cat='concat', exchange=False)
    finally:
        torch.Tensor.cuda = old_cuda
    sd = {k: torch.tensor(v)
          for k, v in flax_generator_to_torch(
              models['gvars'], module_prefix=False).items()}
    netG.load_state_dict(sd, strict=True)


def test_joint_d_strict_load_and_forward_matches(models):
    from text2img_ekl_tpu.io_utils.torch_export import flax_joint_d_to_torch
    rmodel = models['rmodel']
    torch.manual_seed(1)
    netD = rmodel.JOINT_D_NET64(use_cap=False)
    sd = {k: torch.tensor(v)
          for k, v in flax_joint_d_to_torch(
              models['dvars'], imsize=64, module_prefix=False).items()}
    netD.load_state_dict(sd, strict=True)
    netD.eval()

    rng = np.random.default_rng(2)
    img = np.tanh(rng.normal(size=(4, 64, 64, 3))).astype(np.float32)
    mu = rng.normal(size=(4, 16)).astype(np.float32) * 0.3
    with torch.no_grad():
        tp, up, cp = netD(
            torch.tensor(np.ascontiguousarray(img.transpose(0, 3, 1, 2))),
            torch.tensor(mu))
    ours = models['D'].apply(models['dvars'], jnp.asarray(img),
                             jnp.asarray(mu), train=False)
    np.testing.assert_allclose(np.asarray(ours[0]), tp.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[1]), up.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[2]), cp.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_pth_files_roundtrip(tmp_path, models):
    from text2img_ekl_tpu.io_utils.torch_export import (
        save_torch_discriminator, save_torch_generator)
    from text2img_ekl_tpu.io_utils.torch_import import (
        load_torch_discriminator, load_torch_generator)
    gp = str(tmp_path / 'netG_1000.pth')
    dp = str(tmp_path / 'netD0.pth')
    save_torch_generator(models['gvars'], gp)
    save_torch_discriminator(models['dvars'], 64, dp)
    back_g = load_torch_generator(gp, models['gvars'])
    back_d = load_torch_discriminator(dp, models['dvars'], imsize=64)
    _tree_equal(models['gvars'], back_g)
    _tree_equal(models['dvars'], back_d)
