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


def _batch(cfg, B):
    # the strategy schema is derived from cfg inside the shared builder
    return make_synthetic_batch(cfg, B)


def _setup(name, B=16):
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    batch = shard_batch(mesh, _batch(cfg, B))
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


def test_flagship_posterior_diagnostics(flagship_run):
    """The step reports CA/VC posterior mu/std means for both split-z
    paths — the reference's per-epoch mu/std dump
    (cub_trainer_splitz_cap_ca.py:655-656), reduced to scalars. std comes
    out of exp(0.5*logvar) so it must be strictly positive."""
    m = flagship_run['metrics']
    for path in ('sen', 'cls'):
        assert 'mu_%s_mean' % path in m
        assert m['std_%s_mean' % path] > 0


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
    # Program-equivalence at tight tolerance needs the f32 numerics
    # path: the uint8 entry normalize and bf16 BN IO (both shipped
    # defaults) round differently across compilation variants — 1-ulp
    # deltas the nets amplify past atol. Their schema/dtype equivalence
    # claims have their own dedicated tests
    # (test_uint8_input.py, tools/bn_dtype_convergence.py evidence).
    cfg.TPU_UINT8_INPUT = False
    cfg.TPU_BN_DTYPE = 'float32'
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


def test_sharded_adam_matches_replicated():
    """TPU_SHARDED_ADAM (ZeRO-1 weight-update sharding,
    arXiv:2004.13336): reduce_scatter grads -> shard-local Adam ->
    all_gather deltas computes the SAME training trajectory as replicated
    Adam, while each device stores only 1/N of the moments."""
    name = 'birds_2stg_splitz_cap_ca.realcls.yml'
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    batch = shard_batch(mesh, _batch(cfg, 16))

    cfg.TPU_SHARDED_ADAM = False
    state_r = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    step_r = make_train_step(cfg, G, Ds, mesh)
    cfg.TPU_SHARDED_ADAM = True
    state_z = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg),
                                 mesh=mesh)
    step_z = make_train_step(cfg, G, Ds, mesh)

    # the sharded mode holds ONE global moment vector, not a replica tree
    mu_z = jax.tree.leaves(state_z.g_opt_state)
    assert any(getattr(x, 'ndim', 0) == 1 for x in mu_z)

    # one step: strict equivalence (the reduce_scatter sums the same
    # values as pmean, modulo association order)
    state_r, mr, _ = step_r(state_r, batch, jax.random.PRNGKey(5))
    state_z, mz, _ = step_z(state_z, batch, jax.random.PRNGKey(5))
    for k in mr:
        np.testing.assert_allclose(float(mr[k]), float(mz[k]),
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    # Adam's normalized step is sign-like where |g| ~ 0 (zero-init
    # biases with near-cancelling batch gradients), so the ~1e-7
    # association-order difference between pmean and reduce_scatter can
    # flip individual updates; each one-step update is bounded by ~lr, so
    # the drift bound is 2*lr per element. The collective plumbing itself
    # is checked exactly in test_zero1_reduction_matches_pmean.
    lr = cfg.TRAIN.GENERATOR_LR
    for pr, pz in zip(jax.tree.leaves(state_r.g_params),
                      jax.tree.leaves(state_z.g_params)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pz),
                                   rtol=2e-4, atol=2.2 * lr)
    for pr, pz in zip(jax.tree.leaves(state_r.d_params),
                      jax.tree.leaves(state_z.d_params)):
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pz),
                                   rtol=2e-4, atol=2.2 * lr)

    # two more steps at Adam debias counters 2 and 3 — RESYNCED: before
    # each step the ZeRO-1 state is rebuilt bit-exactly from the
    # replicated trajectory (migrate_opt_state ravels the moment tree
    # into the flat sharded vectors), so every comparison is a strict
    # one-step equivalence at a later optimizer state instead of a
    # free-running trajectory race. (The free-running form was chaotic:
    # the ~1e-7 pmean/reduce_scatter association-order difference
    # amplifies through the adversarial dynamics, and its band had to be
    # widened to 6% after an unrelated bias-init change — too loose to
    # catch a real moment-sharding bug. Resyncing keeps the one-step
    # 2e-4 bar at every counter and is stable across init changes.)
    from text2img_ekl_tpu.train.state import migrate_opt_state
    for i in range(2):
        state_z = state_z.replace(
            step=state_r.step,
            g_params=state_r.g_params,
            g_batch_stats=state_r.g_batch_stats,
            d_params=state_r.d_params,
            d_batch_stats=state_r.d_batch_stats,
            g_opt_state=migrate_opt_state(
                state_r.g_opt_state, state_z.g_opt_state, state_r.g_params),
            d_opt_states=tuple(
                migrate_opt_state(ro, zo, rp) for ro, zo, rp in
                zip(state_r.d_opt_states, state_z.d_opt_states,
                    state_r.d_params)))
        # both steps donate their input state; the resynced state shares
        # buffers with state_r, so deep-copy before either donation
        state_z = jax.tree.map(jnp.copy, state_z)
        state_r, mr, _ = step_r(state_r, batch, jax.random.PRNGKey(6 + i))
        state_z, mz, _ = step_z(state_z, batch, jax.random.PRNGKey(6 + i))
        for k in mr:
            assert np.isfinite(float(mz[k])), k
            np.testing.assert_allclose(float(mr[k]), float(mz[k]),
                                       rtol=2e-4, atol=1e-5, err_msg=k)
        for pr, pz in zip(jax.tree.leaves(state_r.g_params),
                          jax.tree.leaves(state_z.g_params)):
            np.testing.assert_allclose(np.asarray(pr), np.asarray(pz),
                                       rtol=2e-4, atol=2.2 * lr)


def test_grouped_d_matches_sequential():
    """TPU_GROUPED_D (vmapped real/wrong/fake D pass, default off — 5%
    slower on the v5e, PERF.md) computes the SAME step as the sequential
    three-pass form: per-group BN stats equal per-pass stats, and the
    running averages are combined exactly."""
    name = 'birds_2stg_splitz_cap_ca.realcls.yml'
    cfg = _small(cfg_from_file(os.path.join(REF_CFG_DIR, name)))
    # f32 numerics path — program-equivalence test at tight tolerance
    # (see test_gspmd_mode_matches_single_device for why the uint8/bf16
    # defaults are excluded here)
    cfg.TPU_UINT8_INPUT = False
    cfg.TPU_BN_DTYPE = 'float32'
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
    cfg, state, batch, step = _setup('coco_2stgs.yml')
    new_state, metrics, _ = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert float(metrics['kl_cls']) == 0.0  # single KL for the coco path
    assert float(metrics['errD']) > 0


def test_zero1_reduction_matches_pmean():
    """The ZeRO-1 collective plumbing in isolation: flatten -> pad ->
    psum_scatter/n -> all_gather -> unflatten over a pytree equals
    lax.pmean of the tree to float tolerance (no optimizer involved)."""
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P
    from text2img_ekl_tpu.parallel.mesh import DATA_AXIS

    mesh = make_mesh()
    n = mesh.devices.size
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    # leading axis = device-local values (different on every device)
    tree = {'w': jax.random.normal(k1, (n, 5, 7)),
            'b': jax.random.normal(k2, (n, 13))}

    def body(t):
        ref = jax.tree.map(lambda x: jax.lax.pmean(x, DATA_AXIS), t)
        flat, unravel = ravel_pytree(t)
        pad = (-flat.size) % n
        flatp = jnp.pad(flat, (0, pad))
        shard = jax.lax.psum_scatter(
            flatp, DATA_AXIS, scatter_dimension=0, tiled=True) / n
        full = jax.lax.all_gather(shard, DATA_AXIS, axis=0, tiled=True)
        return ref, unravel(full[:flat.size])

    specs = {'w': P(DATA_AXIS), 'b': P(DATA_AXIS)}
    ref, got = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(specs,), out_specs=(P(), P()),
        check_vma=False))(tree)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        ref, got)


def test_caption_sampler_matches_looped_calls():
    """make_caption_sample_fn (ONE vmapped call over the caption axis,
    uint8-quantized on device — the eval loop's batched protocol) must
    reproduce the looped per-caption sampler + host quantization: same
    keys, same noise, per-caption BatchNorm statistics."""
    from text2img_ekl_tpu.train.step import (make_caption_sample_fn,
                                             make_sample_fn)
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    g_vars = {'params': state.g_params, 'batch_stats': state.g_batch_stats}

    B, C = 2, 3
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((B, cfg.GAN.Z_DIM), dtype=np.float32)
    emb_all = 0.3 * rng.standard_normal(
        (C, B, cfg.TEXT.DIMENSION)).astype(np.float32)
    onehot = np.eye(cfg.GAN.ENTITY_DIM, dtype=np.float32)[
        rng.integers(0, cfg.GAN.ENTITY_DIM, B)]
    keys = np.stack([np.array([100, i], np.uint32) for i in range(C)])

    loop = make_sample_fn(cfg, G, train_mode=True)
    cap = make_caption_sample_fn(cfg, G, train_mode=True, pattern='cls')
    out = np.asarray(cap(g_vars, keys,
                         np.broadcast_to(noise, (C,) + noise.shape),
                         emb_all, onehot))
    assert out.dtype == np.uint8
    assert out.shape[:2] == (C, B)
    for i in range(C):
        ref = np.asarray(loop(g_vars, keys[i], noise, emb_all[i],
                              onehot)[-1])
        ref8 = np.clip((ref.astype(np.float32) + 1.0) * 127.5,
                       0, 255).astype(np.uint8)
        # +-1 LSB: vmapped vs single-call fusion may round differently
        np.testing.assert_allclose(out[i].astype(np.int16),
                                   ref8.astype(np.int16), atol=1)


@pytest.mark.parametrize('mode', ['full', 'conv'])
def test_remat_g_matches_baseline(mode):
    """TPU_REMAT_G recomputes the SAME primals in the G backward —
    losses, updated params, and fakes must match the no-remat step
    (f32 numerics path, as for the other program-transform equivalence
    tests)."""
    cfg = cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml'))
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_UINT8_INPUT = False
    cfg.TPU_BN_DTYPE = 'float32'

    results = {}
    for remat in ('', mode):
        cfg.TPU_REMAT_G = remat
        G = build_generator(cfg)
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                   cond_code_width(cfg))
        step = make_train_step(cfg, G, Ds, None)
        batch = make_synthetic_batch(cfg, 4)
        new_state, metrics, fakes = step(state, batch, jax.random.PRNGKey(1))
        results[remat] = dict(
            metrics={k: float(v) for k, v in metrics.items()},
            g1=np.asarray(jax.tree.leaves(new_state.g_params)[0]),
            fakes=np.asarray(fakes))
    for k, v in results['']['metrics'].items():
        np.testing.assert_allclose(results[mode]['metrics'][k], v,
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(results[mode]['g1'], results['']['g1'],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(results[mode]['fakes'],
                               results['']['fakes'], atol=1e-4)


def test_grad_accum_matches_mesh():
    """TPU_GRAD_ACCUM=k treats microbatches as virtual data-parallel
    replicas: accum=8 on ONE device and (mesh 2, accum 4) both reproduce
    the 8-device shard_map run — same per-(micro)batch BN statistics,
    same RNG fold by virtual replica index, same averaged grads into one
    Adam update. This is what lets few chips rehearse a big mesh's
    numerics, or run an effective batch that doesn't fit."""
    cfg = cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml'))
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    # f32 numerics path for program-equivalence at tight tolerance (the
    # uint8/bf16 defaults round differently across compilation variants;
    # see test_gspmd_mode_matches_single_device).
    cfg.TPU_UINT8_INPUT = False
    cfg.TPU_BN_DTYPE = 'float32'
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    batch = _batch(cfg, 16)

    results = {}
    for label, accum, n_dev in (('mesh8', 0, 8),
                                ('accum8', 8, 1),
                                ('mesh2_accum4', 4, 2)):
        cfg.TPU_GRAD_ACCUM = accum
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        state = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
        step = make_train_step(cfg, G, Ds, mesh)
        b = shard_batch(mesh, batch) if mesh is not None else batch
        new_state, metrics, fakes = step(state, b, jax.random.PRNGKey(1))
        results[label] = dict(
            metrics={k: float(v) for k, v in metrics.items()},
            g1=np.asarray(jax.tree.leaves(new_state.g_params)[0]),
            d1=np.asarray(jax.tree.leaves(new_state.d_params[0])[0]),
            bs=np.asarray(jax.tree.leaves(new_state.g_batch_stats)[0]),
            fakes=np.asarray(fakes))
    cfg.TPU_GRAD_ACCUM = 0

    ref = results['mesh8']
    for label in ('accum8', 'mesh2_accum4'):
        got = results[label]
        for k, v in ref['metrics'].items():
            np.testing.assert_allclose(got['metrics'][k], v,
                                       rtol=2e-4, atol=1e-5,
                                       err_msg='%s %s' % (label, k))
        np.testing.assert_allclose(got['g1'], ref['g1'],
                                   rtol=1e-4, atol=1e-6, err_msg=label)
        np.testing.assert_allclose(got['d1'], ref['d1'],
                                   rtol=1e-4, atol=1e-6, err_msg=label)
        np.testing.assert_allclose(got['bs'], ref['bs'],
                                   rtol=1e-5, atol=1e-7, err_msg=label)
        np.testing.assert_allclose(got['fakes'], ref['fakes'],
                                   atol=1e-4, err_msg=label)


def test_grad_accum_requires_divisible_batch():
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    cfg.TPU_GRAD_ACCUM = 3
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    step = make_train_step(cfg, G, Ds, None)
    with pytest.raises(ValueError, match='TPU_GRAD_ACCUM'):
        step(state, _batch(cfg, 4), jax.random.PRNGKey(1))


def test_default_state_has_no_ema(flagship_run):
    """TPU_EMA_DECAY=0 is the faithful default (the reference's
    avg_param_G update is commented out): no EMA slot is carried."""
    assert flagship_run['state'].g_ema_params is None


def test_ema_update_math():
    """TPU_EMA_DECAY>0: after one step,
    ema == decay * ema0 + (1-decay) * updated_params exactly (the
    reference's dormant avg_p.mul_(0.999).add_(0.001, p) formula,
    cub_trainer_splitz_cap_ca.py:609-610)."""
    cfg = _small(cfg_from_file(
        os.path.join(REF_CFG_DIR, 'birds_2stg_splitz_cap_ca.realcls.yml')))
    cfg.TPU_EMA_DECAY = 0.9
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, RNG, cond_code_width(cfg))
    assert state.g_ema_params is not None
    # EMA starts as a copy of the init params
    for a, p in zip(jax.tree.leaves(state.g_ema_params),
                    jax.tree.leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))
    ema0 = [np.asarray(l) for l in jax.tree.leaves(state.g_ema_params)]

    step = make_train_step(cfg, G, Ds, None)
    new_state, _, _ = step(state, _batch(cfg, 2), jax.random.PRNGKey(1))
    new_p = [np.asarray(l) for l in jax.tree.leaves(new_state.g_params)]
    new_a = [np.asarray(l) for l in jax.tree.leaves(new_state.g_ema_params)]
    moved = 0.0
    for a, e0, p in zip(new_a, ema0, new_p):
        np.testing.assert_allclose(a, 0.9 * e0 + 0.1 * p,
                                   rtol=1e-6, atol=1e-7)
        moved = max(moved, float(np.max(np.abs(a - e0))))
    assert moved > 0  # the update actually moved the average


def test_eval_g_variables_prefers_ema():
    """Offline eval/export scores the EMA weights when present (reference
    save_model writes avg_param_G into the .pth) and always keeps the
    LIVE BatchNorm buffers (copy_G_params covers only .parameters())."""
    from text2img_ekl_tpu.train.state import TrainState, eval_g_variables
    live = {'w': jnp.ones((2,))}
    ema = {'w': jnp.full((2,), 3.0)}
    bs = {'m': jnp.full((2,), 7.0)}
    st = TrainState(step=jnp.zeros((), jnp.int32), g_params=live,
                    g_batch_stats=bs, g_opt_state=None, d_params=(),
                    d_batch_stats=(), d_opt_states=(), g_ema_params=ema)
    v = eval_g_variables(st)
    np.testing.assert_array_equal(np.asarray(v['params']['w']), 3.0)
    np.testing.assert_array_equal(np.asarray(v['batch_stats']['m']), 7.0)
    v_live = eval_g_variables(st, use_ema=False)
    np.testing.assert_array_equal(np.asarray(v_live['params']['w']), 1.0)
    st_off = st.replace(g_ema_params=None)
    v_off = eval_g_variables(st_off)
    np.testing.assert_array_equal(np.asarray(v_off['params']['w']), 1.0)
