"""ONE-TRAIN-STEP parity against the reference's COCO/concat trainer.

Same method as test_reference_step_parity.py, for the second trainer
family (`/root/reference/trainer.py`): single-VC_NET CondGNet over
cat(txt, multi-hot cls), soft EKL targets real_cp = cls/sum(cls)
(trainer.py:516-517), the inline fake_cp construction
(trainer.py:421-426), and the same D-before-G/Adam machinery — all run
through the reference's OWN `train_joint_Dnet`/`loss_joint_Gnet` with
transplanted weights and injected reparameterization draws. No capsule
stub is needed on this path (COND_G_NET use_cap=False exercises the
plain COND_INIT_STAGE_G, whose one-arg call signature is valid here,
model.py:687-689).

Config note: the committed coco trainer cannot run verbatim — its
load_network returns the unconditional G_NET whose forward doesn't
accept cond_info (trainer.py:111-117 vs 526-528), and under the shipped
CAT_Z default 'concat' COND_INIT_STAGE_G expects a 2*MANIFD-wide code
but VC_NET emits MANIFD (model.py:207-210). The test instantiates the G
the loss path actually consumes (COND_G_NET, the entity_netG built two
lines below the dead G_NET) and sets CAT_Z='product' so the reference's
own width formulas are self-consistent; our implementation sizes these
from the actual code widths (step.cond_code_width, generator.py) so it
is unaffected either way.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')
flax = pytest.importorskip('flax')

from test_reference_step_parity import (  # noqa: E402
    BS, LR, _install_stubs, _masked_update_check)

REF = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, 'trainer.py')),
    reason='reference repo not mounted')


@pytest.fixture(scope='module')
def run():
    _install_stubs()
    old_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from miscc.config import cfg as rcfg
        import model as rmodel
        # trainer.py imports `from tensorboard import summary, FileWriter`
        # (the 2017 TF-tensorboard API); the installed modern tensorboard
        # has neither. Shadow it ONLY around this import.
        import types as _types
        tb_stub = _types.ModuleType('tensorboard')
        tb_stub.summary = _types.SimpleNamespace(
            scalar=lambda *a, **k: None)
        tb_stub.FileWriter = object
        old_tb = sys.modules.get('tensorboard')
        sys.modules['tensorboard'] = tb_stub
        try:
            import trainer as rtrain
        finally:
            if old_tb is None:
                del sys.modules['tensorboard']
            else:
                sys.modules['tensorboard'] = old_tb

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
        rcfg.TREE.BASE_SIZE = 64
        rcfg.TRAIN.BATCH_SIZE = BS
        rcfg.TRAIN.CAT_Z = 'product'  # see module docstring
        rcfg.TRAIN.COEFF.UNCOND_LOSS = 1.0
        rcfg.TRAIN.COEFF.KL = 2.0
        rcfg.TRAIN.GENERATOR_LR = LR
        rcfg.TRAIN.DISCRIMINATOR_LR = LR

        from text2img_ekl_tpu.config import cfg_from_file
        from text2img_ekl_tpu.io_utils.torch_import import (
            torch_generator_to_flax, torch_joint_d_to_flax)
        from text2img_ekl_tpu.models import (build_discriminators,
                                             build_generator)
        from text2img_ekl_tpu.train import create_train_state, make_train_step
        from text2img_ekl_tpu.train.step import cond_code_width

        cfg = cfg_from_file('/root/reference/cfg/coco_2stgs.yml')
        cfg.TEXT.DIMENSION = 12
        cfg.GAN.EMBEDDING_DIM = 8
        cfg.GAN.MANIFD_DIM = 8
        cfg.GAN.Z_DIM = 8
        cfg.GAN.GF_DIM = 16
        cfg.GAN.DF_DIM = 16
        cfg.GAN.ENTITY_DIM = 5
        cfg.GAN.R_NUM = 2
        cfg.TRAIN.BATCH_SIZE = BS
        cfg.TRAIN.GENERATOR_LR = LR
        cfg.TRAIN.DISCRIMINATOR_LR = LR
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_BN_DTYPE = 'float32'
        cfg.TPU_CAPSULE_PALLAS = False
        cfg.TPU_UINT8_INPUT = False

        torch.manual_seed(23)
        share_gs = rmodel.get_shareGs(rcfg.GAN.GF_DIM)
        netG = rmodel.COND_G_NET(
            rcfg.GAN.ENTITY_DIM + 1 + rcfg.TEXT.DIMENSION, share_gs,
            use_cap=False)
        netsD = [rmodel.JOINT_D_NET64(), rmodel.JOINT_D_NET128()]
        netG.train()
        for d in netsD:
            d.train()

        G = build_generator(cfg)
        assert type(G).__name__ == 'CondGNet'
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                   cond_code_width(cfg))
        gvars = torch_generator_to_flax(
            netG.state_dict(),
            {'params': state.g_params, 'batch_stats': state.g_batch_stats})
        dvars = [
            torch_joint_d_to_flax(
                netsD[i].state_dict(),
                {'params': state.d_params[i],
                 'batch_stats': state.d_batch_stats[i]},
                imsize=(64, 128)[i])
            for i in range(2)]
        state = state.replace(
            g_params=gvars['params'], g_batch_stats=gvars['batch_stats'],
            d_params=tuple(v['params'] for v in dvars),
            d_batch_stats=tuple(v['batch_stats'] for v in dvars))
        g_params_pre = jax.tree.map(np.asarray, state.g_params)
        d_params_pre = [jax.tree.map(np.asarray, p) for p in state.d_params]

        rng = np.random.default_rng(5)
        r64 = np.tanh(rng.normal(size=(BS, 64, 64, 3))).astype(np.float32)
        r128 = np.tanh(rng.normal(size=(BS, 128, 128, 3))).astype(np.float32)
        w64 = np.tanh(rng.normal(size=(BS, 64, 64, 3))).astype(np.float32)
        w128 = np.tanh(rng.normal(size=(BS, 128, 128, 3))).astype(np.float32)
        txt = rng.normal(size=(BS, 12)).astype(np.float32) * 0.4
        # soft multi-hot targets: the coco strategy's real_cp = cls/sum
        # (trainer.py:516-517); col 0 forced so no row is empty
        multi = (rng.uniform(size=(BS, 6)) > 0.6).astype(np.float32)
        multi[:, 0] = 1.0
        cond = np.concatenate([txt, multi], axis=1)
        real_cp = multi / multi.sum(axis=1, keepdims=True)
        batch = {
            'real': (jnp.asarray(r64), jnp.asarray(r128)),
            'wrong': (jnp.asarray(w64), jnp.asarray(w128)),
            'cond': jnp.asarray(cond), 'real_cp': jnp.asarray(real_cp),
        }

        step_key = jax.random.PRNGKey(77)
        k_noise, k_reparam, k_prior = jax.random.split(step_key, 3)
        noise = jax.random.normal(k_noise, (BS, cfg.GAN.Z_DIM), jnp.float32)
        out, aux = G.apply(
            {'params': state.g_params, 'batch_stats': state.g_batch_stats},
            noise, batch['cond'], train=True,
            rngs={'reparam': k_reparam, 'cls_prior': k_prior},
            mutable=['batch_stats', 'intermediates'],
            capture_intermediates=True)
        _, mu_j, lv_j, _ = out
        c, m, l, s = aux['intermediates']['vc_net']['__call__'][0]
        np.testing.assert_allclose(np.asarray(m), np.asarray(mu_j))
        eps = torch.tensor(np.asarray((c - m) / s))

        step_fn = make_train_step(cfg, G, Ds)
        new_state, metrics, fakes = step_fn(state, batch, step_key)
        ours = dict(
            metrics={k: float(v) for k, v in metrics.items()},
            fakes=np.asarray(fakes),
            g_delta=jax.tree.map(
                lambda a, b: np.asarray(a) - b, new_state.g_params,
                g_params_pre),
            d_delta=[jax.tree.map(
                lambda a, b: np.asarray(a) - b, new_state.d_params[i],
                d_params_pre[i]) for i in range(2)],
        )

        netG.vc_net.reparameterize = lambda mu, logvar, seed: (
            mu + torch.exp(0.5 * logvar) * eps, torch.exp(0.5 * logvar))
        optG, optsD = rtrain.define_optimizers(netG, netsD)
        t = object.__new__(rtrain.condGANTrainer)
        t.batch_size = BS
        t.num_Ds = 2
        t.criterion = torch.nn.BCELoss()
        t.bce_logit = torch.nn.BCEWithLogitsLoss()
        t.nll = torch.nn.NLLLoss()
        t.CE = rtrain.ce_loss
        t.real_labels = torch.ones(BS)
        t.fake_labels = torch.zeros(BS)
        t.real_cp = torch.tensor(real_cp)
        t.netsD = netsD
        t.optimizersD = optsD

        def _nchw(a):
            return torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))

        t.real_imgs = [_nchw(r64), _nchw(r128)]
        t.wrong_imgs = [_nchw(w64), _nchw(w128)]

        # trainer loop lines 523-530: G forward on cat(txt, cls), decode
        hcodes, mu, lv, _ = netG(torch.tensor(np.asarray(noise)),
                                 torch.tensor(cond))
        t.fake_imgs = netG.image(hcodes)
        t.mu, t.logvar = mu, lv
        np.testing.assert_allclose(mu.detach().numpy(), np.asarray(mu_j),
                                   rtol=1e-4, atol=1e-5)

        errD, d_grads = [], []
        for i in range(2):
            errD.append(t.train_joint_Dnet(i, 1))
            d_grads.append({
                n: (p.grad.clone() if p.grad is not None
                    else torch.zeros_like(p))
                for n, p in netsD[i].named_parameters()})
        netG.zero_grad()
        errGs, gm, gu, gc, kl = t.loss_joint_Gnet(1)
        errGs.backward()
        g_grads = {n: (p.grad.clone() if p.grad is not None
                       else torch.zeros_like(p))
                   for n, p in netG.named_parameters()}
        optG.step()

        ref = dict(
            errD=[tuple(float(x.detach()) for x in e) for e in errD],
            errG=float(errGs.detach()), g_match=float(gm.detach()),
            g_uncond=float(gu.detach()), g_cls=float(gc.detach()),
            kl=float(kl.detach()),
            fakes=t.fake_imgs[-1].detach().numpy().transpose(0, 2, 3, 1),
        )
        return dict(ours=ours, ref=ref, netG=netG, netsD=netsD,
                    g_grads=g_grads, d_grads=d_grads,
                    state_pre=(g_params_pre, d_params_pre),
                    to_g=torch_generator_to_flax, to_d=torch_joint_d_to_flax,
                    shaped_g=gvars, shaped_d=dvars)
    finally:
        torch.Tensor.cuda = old_cuda


def test_d_losses_match(run):
    m = run['ours']['metrics']
    tot = sum(e[0] for e in run['ref']['errD'])
    match = sum(e[1] for e in run['ref']['errD'])
    uncond = sum(e[2] for e in run['ref']['errD'])
    cls_ = sum(e[3] for e in run['ref']['errD'])
    for ours, ref in [(m['errD'], tot), (m['errD_match'], match),
                      (m['errD_uncond'], uncond), (m['errD_cls'], cls_)]:
        np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-3)


def test_g_losses_and_kl_match(run):
    m = run['ours']['metrics']
    r = run['ref']
    np.testing.assert_allclose(m['errG'], r['errG'], rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(m['errG_match'], r['g_match'],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(m['errG_uncond'], r['g_uncond'],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(m['errG_cls'], r['g_cls'],
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(m['kl_sen'], r['kl'], rtol=1e-2, atol=1e-4)
    assert m['kl_cls'] == 0.0  # single-VC strategy has one KL


def test_fake_images_match(run):
    np.testing.assert_allclose(run['ours']['fakes'], run['ref']['fakes'],
                               rtol=1e-2, atol=5e-3)


def test_g_param_updates_match(run):
    g_pre, _ = run['state_pre']
    to_g = run['to_g']
    shaped = run['shaped_g']
    post = to_g(run['netG'].state_dict(), shaped)['params']
    delta_ref = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                             post, g_pre)
    gsd = dict(run['netG'].state_dict())
    gsd.update(run['g_grads'])
    grads_ref = to_g(gsd, shaped)['params']
    _masked_update_check(run['ours']['g_delta'], delta_ref, grads_ref,
                         'G/coco')


@pytest.mark.parametrize('i', [0, 1])
def test_d_param_updates_match(run, i):
    _, d_pre = run['state_pre']
    to_d = run['to_d']
    shaped = run['shaped_d'][i]
    imsize = (64, 128)[i]
    post = to_d(run['netsD'][i].state_dict(), shaped,
                imsize=imsize)['params']
    delta_ref = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                             post, d_pre[i])
    dsd = dict(run['netsD'][i].state_dict())
    dsd.update(run['d_grads'][i])
    grads_ref = to_d(dsd, shaped, imsize=imsize)['params']
    _masked_update_check(run['ours']['d_delta'][i], delta_ref, grads_ref,
                         'D%d/coco' % i)
