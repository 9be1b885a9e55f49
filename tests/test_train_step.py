"""Fused train-step tests on the 8-device virtual CPU mesh.

Compiled steps are shared across tests via module-scoped fixtures — the
fused G+D graph is expensive to compile on a single-CPU CI host.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.models import build_discriminators, build_generator
from text2img_ekl_tpu.parallel import make_mesh, shard_batch
from text2img_ekl_tpu.train import create_train_state, make_train_step
from text2img_ekl_tpu.train.step import cond_code_width, make_synthetic_batch

REF_CFG_DIR = '/root/reference/cfg'
RNG = jax.random.PRNGKey(0)


def _small(cfg, bs=2):
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = bs
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    return cfg


def _batch(cfg, B, coco=False):
    # the strategy schema is derived from cfg inside the shared builder
    return make_synthetic_batch(cfg, B)


def _setup(name, coco=False, B=16):
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    batch = shard_batch(mesh, _batch(cfg, B, coco))
    step = make_train_step(cfg, G, Ds, mesh)
    return cfg, state, batch, step


@pytest.fixture(scope='module')
def flagship():
    return _setup('birds_2stg_splitz_cap_ca.realcls.yml')


@pytest.fixture(scope='module')
def flagship_run(flagship):
    """One compiled+executed step, shared by several assertions.

    Later steps donate the state buffers, so everything inspected by
    individual tests is materialized to numpy here.
    """
    cfg, state, batch, step = flagship
    g0 = np.asarray(jax.tree.leaves(state.g_params)[0])
    d0 = np.asarray(jax.tree.leaves(state.d_params[0])[0])
    new_state, metrics, fakes = step(state, batch, jax.random.PRNGKey(1))
    g1 = np.asarray(jax.tree.leaves(new_state.g_params)[0])
    d1 = np.asarray(jax.tree.leaves(new_state.d_params[0])[0])
    bs_leaf = jax.tree.leaves(new_state.g_batch_stats)[0]
    bs_shards = [np.asarray(s.data) for s in bs_leaf.addressable_shards]
    step_no = int(new_state.step)
    metrics = {k: float(v) for k, v in metrics.items()}
    return dict(cfg=cfg, batch=batch, step=step, state=new_state,
                metrics=metrics, g0=g0, g1=g1, d0=d0, d1=d1,
                bs_shards=bs_shards, step_no=step_no,
                fakes=np.asarray(fakes))


def test_flagship_step_metrics_finite(flagship_run):
    assert flagship_run['step_no'] == 1
    for k, v in flagship_run['metrics'].items():
        assert np.isfinite(v), k


def test_flagship_step_returns_top_stage_fakes(flagship_run):
    """The step hands back its own top-stage fakes for the IS stream
    (reference scores the step's fakes, cub_trainer:613-623)."""
    r = flagship_run
    top = r['cfg'].branch_sizes()[-1]
    B = r['batch']['real'][0].shape[0]
    assert r['fakes'].shape == (B, top, top, 3)
    assert np.all(np.isfinite(r['fakes']))
    assert np.max(np.abs(r['fakes'])) <= 1.0  # tanh output


def test_flagship_params_update(flagship_run):
    r = flagship_run
    assert np.max(np.abs(r['g1'] - r['g0'])) > 0
    assert np.max(np.abs(r['d1'] - r['d0'])) > 0


def test_flagship_loss_decomposition(flagship_run):
    """errD == match + uncond + cls (cub_trainer_splitz_cap_ca.py:448)."""
    m = flagship_run['metrics']
    np.testing.assert_allclose(
        m['errD'], m['errD_match'] + m['errD_uncond'] + m['errD_cls'],
        rtol=1e-5)


def test_flagship_batch_stats_replicated(flagship_run):
    """BN running stats are pmean'd: every shard must agree."""
    shards = flagship_run['bs_shards']
    for s in shards[1:]:
        np.testing.assert_allclose(s, shards[0], rtol=1e-6)


def test_flagship_d_learns_on_fixed_batch(flagship_run):
    """D separates real/fake on a fixed batch within a few steps.

    Runs last in the module: the steps donate/consume the shared state.
    """
    batch, step = flagship_run['batch'], flagship_run['step']
    state = flagship_run['state']
    first = flagship_run['metrics']['errD_match']
    metrics = None
    for i in range(4):
        state, metrics, _ = step(state, batch, jax.random.PRNGKey(2 + i))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (i, k)
    assert float(metrics['errD_match']) < first


def test_gspmd_mode_matches_single_device():
    """TPU_SPMD_MODE='gspmd' (the jit-with-shardings fallback, PERF.md
    pitfall 1): the 8-device partitioned program computes the SAME step as
    the identical program on one device — same global-batch BN stats, same
    grads — so switching modes on real multi-chip hardware is numerically
    free."""
    name = 'birds_2stg_splitz_cap_ca.realcls.yml'
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    cfg.TPU_SPMD_MODE = 'gspmd'
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    batch = _batch(cfg, 16)
    state_a = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    state_b = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    step_g = make_train_step(cfg, G, Ds, mesh)
    step_1 = make_train_step(cfg, G, Ds, None)

    sa, ma, fa = step_g(state_a, shard_batch(mesh, batch),
                        jax.random.PRNGKey(1))
    sb, mb, fb = step_1(state_b, batch, jax.random.PRNGKey(1))
    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(jax.tree.leaves(sa.g_params)[0]),
                               np.asarray(jax.tree.leaves(sb.g_params)[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                               atol=1e-4)


def test_grouped_d_matches_sequential():
    """TPU_GROUPED_D (vmapped real/wrong/fake D pass, default off — 5%
    slower on the v5e, PERF.md) computes the SAME step as the sequential
    three-pass form: per-group BN stats equal per-pass stats, and the
    running averages are combined exactly."""
    name = 'birds_2stg_splitz_cap_ca.realcls.yml'
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    batch = _batch(cfg, 8)

    cfg.TPU_GROUPED_D = False
    state_a = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    sa, ma, fa = make_train_step(cfg, G, Ds, None)(
        state_a, batch, jax.random.PRNGKey(3))
    cfg.TPU_GROUPED_D = True
    state_b = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    sb, mb, fb = make_train_step(cfg, G, Ds, None)(
        state_b, batch, jax.random.PRNGKey(3))

    for k in ma:
        np.testing.assert_allclose(float(ma[k]), float(mb[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        sa.d_batch_stats, sb.d_batch_stats)


def test_three_branch_step():
    """BRANCH_NUM=3 (birds_3stages.yml, 64/128/256px): the fused step
    trains all three stage discriminators and returns 256px fakes — the
    resolution axis the reference scales over (model.py:466-480), which
    its own flagship trainer marks 'br3 todo'."""
    cfg, state, batch, step = _setup('birds_3stages.yml', B=8)
    assert cfg.TREE.BRANCH_NUM == 3
    assert cfg.branch_sizes() == [64, 128, 256]
    assert len(batch['real']) == 3
    new_state, metrics, fakes = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert np.asarray(fakes).shape == (8, 256, 256, 3)
    assert int(new_state.step) == 1


def test_coco_strategy_step():
    cfg, state, batch, step = _setup('coco_2stgs.yml', coco=True)
    new_state, metrics, _ = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics['kl_cls']) == 0.0  # single KL for the coco path
    assert float(metrics['errD']) > 0
