"""Checkpoint round-trip, image savers, metrics logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.io_utils import (
    CheckpointManager, MetricsLogger, make_grid, save_image_grid,
    save_single_images)
from text2img_ekl_tpu.io_utils.checkpoint import parse_epoch_from_path


def test_parse_epoch_from_path():
    assert parse_epoch_from_path('Model/netG_epoch123') == 124
    assert parse_epoch_from_path('Model/netG_210000.pth') == 210001
    assert parse_epoch_from_path('Model/netG') == 0


def test_checkpoint_roundtrip(tmp_path):
    import flax

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray
        w: jnp.ndarray

    mgr = CheckpointManager(str(tmp_path / 'Model'))
    s = S(step=jnp.asarray(5), w=jnp.arange(6.0).reshape(2, 3))
    p = mgr.save(s, epoch=5)
    assert os.path.exists(p)
    restored = mgr.restore(S(step=jnp.asarray(0), w=jnp.zeros((2, 3))))
    assert int(restored.step) == 5
    np.testing.assert_allclose(np.asarray(restored.w), np.asarray(s.w))


def test_checkpoint_latest_picks_highest_epoch(tmp_path):
    import flax

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray

    mgr = CheckpointManager(str(tmp_path / 'Model'))
    for e in [1, 9, 4]:
        mgr.save(S(step=jnp.asarray(e)), epoch=e)
    assert mgr.latest().endswith('state_epoch9')


def test_checkpoint_retention_policy(tmp_path):
    """TPU_KEEP_CHECKPOINTS bounds snapshots on disk: after each save the
    oldest unprotected epochs beyond the newest `keep` are pruned, while
    IS-gated "good model" saves (protect=True) survive forever. keep=0 is
    the reference's never-delete behavior
    (cub_trainer_splitz_cap_ca.py:662-667)."""
    import flax

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray

    mgr = CheckpointManager(str(tmp_path / 'Model'), keep=2)
    for e in range(5):
        mgr.save(S(step=jnp.asarray(e)), epoch=e, protect=(e == 1))
    left = sorted(n for n in os.listdir(mgr.model_dir)
                  if n.startswith('state_epoch'))
    assert left == ['state_epoch1', 'state_epoch3', 'state_epoch4']
    assert mgr.latest().endswith('state_epoch4')
    # the survivors still restore
    r = mgr.restore(S(step=jnp.asarray(0)))
    assert int(r.step) == 4

    # prune=False (non-main host processes) never deletes, and never
    # writes the protect sidecar either — on a multi-host run the orbax
    # save is collective on every process but the manager's filesystem
    # bookkeeping is process-0-only (N-way concurrent sidecar creates on
    # a shared filesystem can surface transient create/lock errors)
    mgr.save(S(step=jnp.asarray(5)), epoch=5, protect=True, prune=False)
    assert len(mgr._epochs()) == 4
    assert not os.path.exists(
        os.path.join(mgr.model_dir, '.protect_epoch5'))

    # keep=0 keeps everything
    mgr0 = CheckpointManager(str(tmp_path / 'Model0'), keep=0)
    for e in range(4):
        mgr0.save(S(step=jnp.asarray(e)), epoch=e)
    assert len(mgr0._epochs()) == 4


def test_make_grid_layout():
    imgs = np.zeros((5, 8, 8, 3), np.float32)
    grid = make_grid(imgs, nrow=4, padding=2)
    # 2 rows x 4 cols
    assert grid.shape == (2 * 10 + 2, 4 * 10 + 2, 3)


def test_save_image_grid(tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)) \
        .astype(np.float32)
    p = str(tmp_path / 'grid.png')
    save_image_grid(imgs, p)
    from PIL import Image
    im = Image.open(p)
    assert im.size[0] > 16


def test_save_single_images_naming(tmp_path):
    imgs = np.zeros((2, 8, 8, 3), np.float32)
    save_single_images(imgs, ['cls1/a', 'cls2/b'], str(tmp_path), 'test',
                       sentence_id=3, classes=[7, 9], imsize=8, noise_id=1)
    expected = tmp_path / 'single_samples' / 'cls1' / \
        'a_8_class7_sid3_nid1.png'
    assert expected.exists()


def test_metrics_logger_jsonl(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log_scalars(10, {'a': 1.5, 'b': 2})
    lg.log_scalars(20, {'a': 2.5})
    lg.close()
    lines = [json.loads(l) for l in
             open(tmp_path / 'metrics.jsonl').read().splitlines()]
    assert lines[0]['step'] == 10 and lines[0]['a'] == 1.5
    assert lines[1]['step'] == 20


def test_save_super_images(tmp_path):
    """10-caption super grids under super/<split>/ with the reference's
    naming (cub_trainer_splitz_cap_ca.py:734-756)."""
    from text2img_ekl_tpu.io_utils.images import save_super_images
    rng = np.random.default_rng(0)
    # 10 captions x batch of 2, 16px images in [-1, 1]
    images_list = [rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
                   for _ in range(10)]
    save_super_images(images_list, ['birds/a', 'birds/b'], str(tmp_path),
                      'test', 16)
    for name in ('a', 'b'):
        p = tmp_path / 'super' / 'test' / 'birds' / f'{name}_16.png'
        assert p.is_file()
        from PIL import Image
        im = Image.open(p)
        assert im.size[0] >= 16 * 10  # 10 per row


def test_checkpoint_roundtrip_sharded_adam(tmp_path):
    """A TrainState whose optimizer moments are GLOBAL vectors sharded
    over the 8-device mesh (TPU_SHARDED_ADAM) round-trips through orbax:
    save gathers the distributed array, restore into an abstract state
    reproduces values and the train step keeps running."""
    import jax
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    cfg = cfg_from_file(
        '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_SHARDED_ADAM = True
    mesh = make_mesh()
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    w = cond_code_width(cfg)
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0), w,
                               mesh=mesh)
    step = make_train_step(cfg, G, Ds, mesh)
    batch = shard_batch(mesh, make_synthetic_batch(cfg, 16))
    state, metrics, _ = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['errG']))

    mgr = CheckpointManager(str(tmp_path / 'Model'))
    mgr.save(state, epoch=1)
    abstract = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0), w,
                                  mesh=mesh)
    restored = mgr.restore(abstract)
    assert int(restored.step) == 1
    from text2img_ekl_tpu.train.state import place_state_on_mesh
    restored = place_state_on_mesh(cfg, mesh, restored)
    for a, b in zip(jax.tree.leaves(state.g_opt_state),
                    jax.tree.leaves(restored.g_opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # and training continues from the restored sharded state
    restored, metrics, _ = step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics['errG']))
    assert int(restored.step) == 2


def test_zero1_checkpoint_topology_migration(tmp_path):
    """ZeRO-1 checkpoints are NOT topology-locked: moments saved on the
    8-device mesh restore onto a 4-device mesh, a 1-device/replicated
    state, and a replicated save restores into the sharded format —
    bit-equal after unpadding (train/state.migrate_opt_state via the
    tolerant restore in io_utils/checkpoint.py)."""
    import jax
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.state import _opt_moment_vectors
    from text2img_ekl_tpu.train.step import (
        cond_code_width, make_synthetic_batch)

    def make(n_dev, sharded):
        cfg = cfg_from_file(
            '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
        cfg.GAN.GF_DIM = 8
        cfg.GAN.DF_DIM = 8
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_CAPSULE_PALLAS = False
        cfg.TPU_SHARDED_ADAM = sharded
        mesh = make_mesh(devices=jax.devices()[:n_dev])
        G = build_generator(cfg)
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                   cond_code_width(cfg), mesh=mesh)
        return cfg, mesh, G, Ds, state

    # train one sharded step on 8 devices so the moments are non-trivial
    cfg8, mesh8, G, Ds, state8 = make(8, True)
    step = make_train_step(cfg8, G, Ds, mesh8)
    batch = shard_batch(mesh8, make_synthetic_batch(cfg8, 16))
    state8, metrics, _ = step(state8, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['errG']))
    mgr = CheckpointManager(str(tmp_path / 'M8'))
    mgr.save(state8, epoch=1)
    params8 = state8.g_params
    _, mu_ref, nu_ref = _opt_moment_vectors(state8.g_opt_state, params8)

    # 8-dev sharded -> 4-dev sharded
    _, _, _, _, tgt4 = make(4, True)
    r4 = mgr.restore(tgt4)
    _, mu4, nu4 = _opt_moment_vectors(r4.g_opt_state, r4.g_params)
    np.testing.assert_array_equal(mu4, mu_ref)
    np.testing.assert_array_equal(nu4, nu_ref)

    # 8-dev sharded -> replicated (1-dev / flag off)
    _, _, _, _, tgt1 = make(1, False)
    r1 = mgr.restore(tgt1)
    _, mu1, nu1 = _opt_moment_vectors(r1.g_opt_state, r1.g_params)
    np.testing.assert_array_equal(mu1, mu_ref)
    np.testing.assert_array_equal(nu1, nu_ref)
    # D opt states migrated too
    _, dmu_ref, _ = _opt_moment_vectors(state8.d_opt_states[0],
                                        state8.d_params[0])
    _, dmu1, _ = _opt_moment_vectors(r1.d_opt_states[0], r1.d_params[0])
    np.testing.assert_array_equal(dmu1, dmu_ref)

    # replicated save -> 8-dev sharded restore (flag flip the other way)
    mgr1 = CheckpointManager(str(tmp_path / 'M1'))
    mgr1.save(r1, epoch=2)
    _, _, _, _, tgt8 = make(8, True)
    r8 = mgr1.restore(tgt8)
    _, mu8, nu8 = _opt_moment_vectors(r8.g_opt_state, r8.g_params)
    np.testing.assert_array_equal(mu8, mu_ref)
    np.testing.assert_array_equal(nu8, nu_ref)

    # and the migrated state trains on the new topology
    cfg4, mesh4, G4, Ds4, _ = make(4, True)
    from text2img_ekl_tpu.train.state import place_state_on_mesh
    r4p = place_state_on_mesh(cfg4, mesh4, r4)
    step4 = make_train_step(cfg4, G4, Ds4, mesh4)
    batch4 = shard_batch(mesh4, make_synthetic_batch(cfg4, 8))
    r4p, m4, _ = step4(r4p, batch4, jax.random.PRNGKey(2))
    assert np.isfinite(float(m4['errG']))


def test_checkpoint_ema_cross_restore(tmp_path, capsys):
    """EMA flag flips across save/restore: an EMA-enabled template
    restoring an older non-EMA checkpoint seeds the average from the
    RESTORED weights (not the template's fresh init), and an EMA
    checkpoint restores into a non-EMA template KEEPING the averages —
    eval configs never set TPU_EMA_DECAY, and silently scoring live
    weights would defeat the feature (the reference's save_model bakes
    avg_param_G into the .pth, cub_trainer_splitz_cap_ca.py:218-228).
    Both flips are FIRST-CLASS: the slot's presence is probed from orbax
    metadata and the strict restore succeeds — the topology-migration
    fallback (and its scary warning) stays reserved for genuine ZeRO-1
    mesh-size changes (io_utils/checkpoint.restore_train_state)."""
    import jax
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.train import create_train_state
    from text2img_ekl_tpu.train.step import cond_code_width

    def make(ema_decay):
        cfg = cfg_from_file(
            '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
        cfg.GAN.GF_DIM = 8
        cfg.GAN.DF_DIM = 8
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_CAPSULE_PALLAS = False
        cfg.TPU_EMA_DECAY = ema_decay
        G = build_generator(cfg)
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        return create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                  cond_code_width(cfg))

    # old checkpoint: no EMA, weights doctored away from any fresh init
    old = make(0.0)
    assert old.g_ema_params is None
    old = old.replace(
        g_params=jax.tree.map(lambda p: p * 2.0 + 1.0, old.g_params),
        step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / 'Mold'))
    mgr.save(old, epoch=1)

    # restore into an EMA-enabled template: EMA == restored weights
    tgt = make(0.999)
    assert tgt.g_ema_params is not None
    r = mgr.restore(tgt)
    assert int(r.step) == 7
    for a, p in zip(jax.tree.leaves(r.g_ema_params),
                    jax.tree.leaves(r.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))
    for a, p in zip(jax.tree.leaves(r.g_params),
                    jax.tree.leaves(old.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))

    # EMA checkpoint (averages doctored to differ from live weights)
    withema = r.replace(
        g_ema_params=jax.tree.map(lambda a: a - 0.5, r.g_ema_params))
    mgr2 = CheckpointManager(str(tmp_path / 'Mema'))
    mgr2.save(withema, epoch=2)

    # same-structure restore keeps the averages bit-exact
    r2 = mgr2.restore(make(0.999))
    for a, b in zip(jax.tree.leaves(r2.g_ema_params),
                    jax.tree.leaves(withema.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ...and an EMA-off template (an eval/resume yml that never sets
    # TPU_EMA_DECAY) still restores the averages bit-exact — they are
    # part of the trained state and eval prefers them (TPU_EMA_EVAL)
    r3 = mgr2.restore(make(0.0))
    assert r3.g_ema_params is not None
    for a, b in zip(jax.tree.leaves(r3.g_ema_params),
                    jax.tree.leaves(withema.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, p in zip(jax.tree.leaves(r3.g_params),
                    jax.tree.leaves(withema.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(p))

    # every flip above took the strict metadata-probed path — the
    # topology-migration fallback's warning never printed
    assert 'different topology' not in capsys.readouterr().out

    # ...but a TRAINING resume with averaging disabled drops the slot
    # loudly: the step would never update it, so it would ride along
    # frozen and eval/export (TPU_EMA_EVAL default) would silently
    # score the stale averages instead of the trained weights
    from text2img_ekl_tpu.train.state import resolve_restored_ema
    dropped = resolve_restored_ema(r3, ema_decay=0.0)
    assert dropped.g_ema_params is None
    assert 'dropping them for this training run' in \
        capsys.readouterr().out
    kept = resolve_restored_ema(r3, ema_decay=0.999)
    assert kept.g_ema_params is not None


def test_restore_generator_state_ignores_d_mismatch(tmp_path):
    """evaluate()'s restore path must work when the eval config doesn't
    describe the training run's discriminator tree: the reference's eval
    loads ONLY netG (cub_trainer_splitz_cap_ca.py:784-800) and its eval
    ymls never set D-side options (e.g. TRAIN.D_CAPSULE, set by the train
    yml only) — a strict full-state restore rejects exactly those
    checkpoints. restore_generator_state refits the G side (params, BN
    stats, EMA slot, step) and leaves the template's Ds untouched."""
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.io_utils.checkpoint import (
        restore_generator_state, restore_train_state)
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.train import create_train_state
    from text2img_ekl_tpu.train.step import cond_code_width

    def make(d_capsule, ema_decay=0.0):
        cfg = cfg_from_file(
            '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
        cfg.GAN.GF_DIM = 8
        cfg.GAN.DF_DIM = 8
        cfg.TRAIN.D_CAPSULE = d_capsule
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_CAPSULE_PALLAS = False
        cfg.TPU_EMA_DECAY = ema_decay
        G = build_generator(cfg)
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        return create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                                  cond_code_width(cfg))

    trained = make(d_capsule=True, ema_decay=0.999)
    trained = trained.replace(
        g_params=jax.tree.map(lambda p: p * 2.0 + 1.0, trained.g_params),
        g_ema_params=jax.tree.map(lambda p: p + 0.25, trained.g_params),
        step=jnp.asarray(11, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / 'Model'))
    path = mgr.save(trained, epoch=3)

    # eval-config template: no D_CAPSULE -> different d_params tree
    template = make(d_capsule=False)
    assert (jax.tree.structure(template.d_params) !=
            jax.tree.structure(trained.d_params))
    with pytest.raises(Exception):
        restore_train_state(path, template)  # strict restore: mismatch

    r = restore_generator_state(path, template)
    assert int(r.step) == 11
    for a, b in zip(jax.tree.leaves(r.g_params),
                    jax.tree.leaves(trained.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r.g_ema_params),
                    jax.tree.leaves(trained.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Ds keep the template's own (fresh) tree — eval never touches them
    assert (jax.tree.structure(r.d_params) ==
            jax.tree.structure(template.d_params))


def test_restore_generator_state_seeds_missing_ema_from_restored(tmp_path):
    """A checkpoint written WITHOUT averaging, restored under an eval
    config that enables TPU_EMA_DECAY: the template's EMA slot holds
    create_train_state's fresh random init, and with the default
    TPU_EMA_EVAL=True evaluate()/export would silently score random
    weights. restore_generator_state must seed the slot from the
    RESTORED live weights instead (mirroring restore_train_state)."""
    from text2img_ekl_tpu.config import cfg_from_file
    from text2img_ekl_tpu.io_utils.checkpoint import restore_generator_state
    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.train import create_train_state
    from text2img_ekl_tpu.train.step import cond_code_width

    def make(ema_decay, seed=0, gf=8):
        cfg = cfg_from_file(
            '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml')
        cfg.GAN.GF_DIM = gf
        cfg.GAN.DF_DIM = 8
        cfg.TPU_COMPUTE_DTYPE = 'float32'
        cfg.TPU_CAPSULE_PALLAS = False
        cfg.TPU_EMA_DECAY = ema_decay
        G = build_generator(cfg)
        Ds = build_discriminators(cfg, cond_code_width(cfg))
        return create_train_state(cfg, G, Ds, jax.random.PRNGKey(seed),
                                  cond_code_width(cfg))

    trained = make(ema_decay=0.0)  # no EMA slot in the checkpoint
    trained = trained.replace(
        g_params=jax.tree.map(lambda p: p * 3.0 - 1.0, trained.g_params))
    mgr = CheckpointManager(str(tmp_path / 'Model'))
    path = mgr.save(trained, epoch=1)

    template = make(ema_decay=0.999, seed=123)  # fresh-random EMA slot
    assert template.g_ema_params is not None
    r = restore_generator_state(path, template)
    assert r.g_ema_params is not None
    for a, b in zip(jax.tree.leaves(r.g_ema_params),
                    jax.tree.leaves(trained.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a G ARCHITECTURE mismatch with identical leaf count (GF_DIM flip
    # changes widths, not the tree) must fail loudly at restore time
    # with a shape diagnostic, not permute/mis-shape silently
    wrong = make(ema_decay=0.0, gf=16)
    with pytest.raises(ValueError, match='different architecture'):
        restore_generator_state(path, wrong)
