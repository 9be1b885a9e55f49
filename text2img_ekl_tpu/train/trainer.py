"""Training/eval orchestration.

The TPU-native counterpart of the reference trainers
(cub_trainer_splitz_cap_ca.py:268-911 and trainer.py:246-838), as ONE
config-driven class:

  * builds G + per-branch joint Ds (load_network,
    cub_trainer_splitz_cap_ca.py:113-196),
  * runs the fused train step over the data mesh (replacing DataParallel),
  * accumulates on-device Inception predictions every ``TPU_IS_EVERY`` steps
    and scores when >= 3000 images (cub_trainer_splitz_cap_ca.py:613-696),
  * saves epoch image grids, epoch snapshots at SNAPSHOT_INTERVAL and every
    epoch > 199, and IS-gated "good model" checkpoints with the reference's
    thresholds (cub_trainer_splitz_cap_ca.py:658-696),
  * ``evaluate`` re-creates the sampling loop: 10 captions x sample_num
    noise draws per test image, optional CLS_PRIOR, single images or 256px
    super grids (cub_trainer_splitz_cap_ca.py:776-911).
"""

from __future__ import annotations

import itertools
import os
import signal
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DataLoader, SyntheticTextDataset, TextDataset
from ..data.transforms import build_eval_transform, build_train_transform
from ..io_utils import (CheckpointManager, MetricsLogger, save_image_grid,
                        save_single_images)
from ..io_utils.images import flush_writes, save_super_images
from ..models import build_discriminators, build_generator
from ..parallel import make_mesh, shard_batch
from ..parallel.mesh import any_process_flag, sync_processes
from .state import create_train_state, resolve_restored_ema
from .step import (cond_code_width, make_caption_sample_fn, make_sample_fn,
                   make_train_step)

# IS save-gates (cub_trainer_splitz_cap_ca.py:670-674)
IS_THRESHOLD_COCO = 6.0
IS_THRESHOLD_CUB_GENERAL = 5.5
IS_THRESHOLD_CUB_FINETUNED = 3.4

# Multi-host signal-stop consensus cadence: every N steps all processes
# allgather their local stop flag (one tiny host-sync collective; at the
# flagship's ~58 ms/step this bounds signal->checkpoint latency to well
# under a second while keeping steps free of per-step host syncs).
STOP_POLL_STEPS = 10


def _local_sample_target(sample_num: int, n_processes: int) -> int:
    """Per-process sample budget for the offline 30k eval protocol
    (TEST.SAMPLE_NUM, miscc/config.py:32). ``evaluate``'s counter is
    process-local and the test loader strides items across processes, so
    the global target splits evenly: P hosts x ceil(SAMPLE_NUM/P) lands
    the total PNG count on SAMPLE_NUM (single process: exact)."""
    return -(-int(sample_num) // max(1, int(n_processes)))


class _NullLogger:
    """Metrics sink for non-main processes in multi-host runs."""

    def log_scalars(self, *a, **kw):
        pass

    def close(self):
        pass


def _host_key(stream: int, n: int) -> np.ndarray:
    """Distinct raw uint32[2] PRNG key built ON THE HOST — a fresh
    jax.random key per call with zero device ops (each unique eager op
    costs a remote compile on first dispatch, tools/bench_dispatch.py),
    and with keys derived from plain counters the training stream is
    deterministic under resume (count comes from state.step), which a
    carried split-chain was not."""
    return np.array([stream & 0xffffffff, n & 0xffffffff], dtype=np.uint32)


class CondGANTrainer:
    def __init__(self, cfg: Config, output_dir: str, data_loader=None,
                 eval_data_loader=None):
        self.cfg = cfg
        self.output_dir = output_dir
        # Multi-host: stdout / TensorBoard / epoch image grids come from
        # process 0 only (checkpoint saves stay on every process — orbax
        # multihost writes are collective); each process's evaluate()
        # writes the PNGs of its own loader stride.
        self.is_main = jax.process_index() == 0
        if cfg.TRAIN.FLAG:
            self.model_dir = os.path.join(output_dir, 'Model')
            self.image_dir = os.path.join(output_dir, 'Image')
            self.log_dir = os.path.join(output_dir, 'Log')
            for d in (self.model_dir, self.image_dir, self.log_dir):
                os.makedirs(d, exist_ok=True)
            self.logger = (MetricsLogger(self.log_dir) if self.is_main
                           else _NullLogger())
            self.ckpt = CheckpointManager(self.model_dir,
                                          keep=cfg.TPU_KEEP_CHECKPOINTS)

        self.mesh = make_mesh(cfg.TPU_DATA_PARALLEL)
        self.num_shards = self.mesh.devices.size
        # Reference global batch = BATCH_SIZE x num devices (main.py:134).
        # Each process loads only its addressable share; shard_batch
        # assembles the global array from the per-host slices.
        self.batch_size = (cfg.TRAIN.BATCH_SIZE * self.num_shards
                           // jax.process_count())
        self.data_loader = data_loader or self._build_loader()
        self.num_batches = len(self.data_loader)

        self.cond_width = cond_code_width(cfg)
        self.G = build_generator(cfg, train_flag=cfg.TRAIN.FLAG)
        self.Ds = build_discriminators(cfg, self.cond_width)
        self.is_coco = cfg.DATASET_NAME == 'coco'

    # ------------------------------------------------------------------
    def _build_loader(self):
        cfg = self.cfg
        split = 'train' if cfg.TRAIN.FLAG else 'test'
        # multi-host: each process decodes a disjoint stride of the epoch
        loader_kw = dict(shuffle=cfg.TRAIN.FLAG, drop_last=True,
                         num_workers=int(cfg.WORKERS),
                         shard_id=jax.process_index(),
                         num_shards=jax.process_count())
        transform = (build_train_transform(cfg.imsize) if cfg.TRAIN.FLAG
                     else build_eval_transform(cfg.imsize))
        # raw uint8 pyramids, normalized on-device by the step
        u8 = bool(getattr(cfg, 'TPU_UINT8_INPUT', False))
        if 'lsun' in cfg.DATA_DIR:
            from ..data import LSUNClassDataset
            ds = LSUNClassDataset(
                '%s/%s_%s_lmdb' % (cfg.DATA_DIR, cfg.DATASET_NAME, split),
                base_size=cfg.TREE.BASE_SIZE, branch_num=cfg.TREE.BRANCH_NUM,
                transform=transform, uint8_output=u8)
            return DataLoader(ds, self.batch_size, **loader_kw)
        if 'imagenet' in cfg.DATA_DIR:
            from ..data import ImageFolderDataset
            from ..data.imagenet_classes import CLASS_DIC
            ds = ImageFolderDataset(
                cfg.DATA_DIR, split_dir='train',
                custom_classes=CLASS_DIC.get(cfg.DATASET_NAME),
                base_size=cfg.TREE.BASE_SIZE, branch_num=cfg.TREE.BRANCH_NUM,
                transform=transform, uint8_output=u8)
            return DataLoader(ds, self.batch_size, **loader_kw)
        has_data = cfg.DATA_DIR and os.path.isdir(
            os.path.join(cfg.DATA_DIR, split))
        if cfg.TPU_SYNTHETIC_DATA or not has_data:
            if not cfg.TPU_SYNTHETIC_DATA:
                print('!! DATA_DIR %r has no %s split — using synthetic data'
                      % (cfg.DATA_DIR, split))
            ds = SyntheticTextDataset(
                num_items=max(512, self.batch_size * 4),
                base_size=cfg.TREE.BASE_SIZE, branch_num=cfg.TREE.BRANCH_NUM,
                entity_dim=cfg.GAN.ENTITY_DIM, text_dim=cfg.TEXT.DIMENSION,
                is_coco=self.is_coco if hasattr(self, 'is_coco')
                else cfg.DATASET_NAME == 'coco',
                train_pairs=cfg.TRAIN.FLAG, uint8_output=u8)
        else:
            ds = TextDataset(
                cfg.DATA_DIR, split, cfg.EMBEDDING_TYPE,
                base_size=cfg.TREE.BASE_SIZE, branch_num=cfg.TREE.BRANCH_NUM,
                entity_dim=cfg.GAN.ENTITY_DIM, train_pairs=cfg.TRAIN.FLAG,
                transform=transform, native_decode=cfg.TPU_NATIVE_DECODE,
                uint8_output=u8)
        return DataLoader(ds, self.batch_size, **loader_kw)

    # ------------------------------------------------------------------
    def _device_batch(self, host_batch: Dict[str, Any]) -> Dict[str, Any]:
        """Host batch dict -> the train step's input contract."""
        cfg = self.cfg
        n1 = cfg.GAN.ENTITY_DIM + 1
        b = {
            # keep the loader's dtype: uint8 pyramids ship 4x fewer H2D
            # bytes and are normalized on-device at the step's entry
            'real': tuple(np.asarray(x) for x in host_batch['imgs']),
            'wrong': tuple(np.asarray(x) for x in host_batch['wrong_imgs']),
        }
        emb = np.asarray(host_batch['embedding'], np.float32)
        cls = host_batch['cls']
        if self.is_coco:
            multi = np.asarray(cls, np.float32)  # [B, ENTITY+1] multi-hot
            b['cond'] = np.concatenate([emb, multi], axis=1)
            denom = np.maximum(multi.sum(1, keepdims=True), 1.0)
            b['real_cp'] = multi / denom  # trainer.py:518
        else:
            labels = np.asarray(cls, np.int64) - 1  # 1-based -> 0-based
            b['txt'] = emb
            b['cls_onehot'] = np.eye(
                cfg.GAN.ENTITY_DIM, dtype=np.float32)[labels]
            b['real_cp'] = np.eye(n1, dtype=np.float32)[labels]
        return shard_batch(self.mesh, b)

    # ------------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None,
              target_step: Optional[int] = None):
        """``max_steps`` bounds steps taken by THIS invocation (debug);
        ``target_step`` is an ABSOLUTE optimizer-step target — a resumed
        run (state.step restored) continues exactly to the same global
        horizon regardless of how many invocations it took (used by the
        long-horizon soak harness, tools/soak.py)."""
        cfg = self.cfg
        if type(self.G).__name__ == 'GNet':
            # The EKL losses need the conditional families; the
            # reference's own unconditional training branch is dead code
            # (main.py:139 imports a nonexistent GANTrainer). GNet
            # SAMPLING (evaluate) is routed and tested.
            raise NotImplementedError(
                'training the unconditional/legacy G_NET family is not '
                'supported (dead code in the reference); use evaluate() '
                'for GNet sampling or a COND_* generator for training')
        state = create_train_state(cfg, self.G, self.Ds,
                                   jax.random.PRNGKey(0), self.cond_width,
                                   mesh=self.mesh)
        start_epoch = 0
        if cfg.TRAIN.NET_G:
            # Explicit train-mode resume: the reference parses the epoch
            # from the configured checkpoint filename and continues
            # (cub_trainer_splitz_cap_ca.py:170-184). Our own checkpoints
            # restore the FULL TrainState (params+BN+Adam+step); reference
            # .pth snapshots restore netG weights exactly as there.
            from ..io_utils.checkpoint import (parse_epoch_from_path,
                                               restore_train_state)
            if cfg.TRAIN.NET_G.endswith('.pth'):
                state = self._place_state(self._load_pth_generator(
                    cfg.TRAIN.NET_G, state))
            else:
                state = self._place_state(
                    restore_train_state(cfg.TRAIN.NET_G, state))
            start_epoch = parse_epoch_from_path(cfg.TRAIN.NET_G)
            print('Load %s (resuming at epoch %d)'
                  % (cfg.TRAIN.NET_G, start_epoch))
        else:
            latest = self.ckpt.latest()
            if latest is not None:
                state = self._place_state(self.ckpt.restore(state, latest))
                start_epoch = int(np.asarray(state.step)) // max(
                    1, self.num_batches)
                print('Resumed from %s (epoch %d)' % (latest, start_epoch))
        if cfg.TRAIN.NET_D:
            # Reference load_network restores each JOINT_D from
            # '%s%d.pth' % (NET_D, i) (cub_trainer_splitz_cap_ca.py:179-184)
            # — without this, resuming a reference run restarts all Ds from
            # scratch, which materially changes a GAN's trajectory.
            state = self._place_state(
                self._load_pth_discriminators(cfg.TRAIN.NET_D, state))
        state = resolve_restored_ema(
            state, getattr(cfg, 'TPU_EMA_DECAY', 0.0))
        step_fn = make_train_step(cfg, self.G, self.Ds, self.mesh)

        # no tower when the stream is disabled outright (TPU_IS_EVERY<=0):
        # the InceptionV3 init + optional conversion is real startup cost
        # on a 1-core host and its random-weights warning would mislead
        scorer = (self._make_is_scorer()
                  if not cfg.TRAIN.BIG_EVAL and cfg.TPU_IS_EVERY > 0
                  else None)
        threshold = (IS_THRESHOLD_COCO if self.is_coco
                     else (IS_THRESHOLD_CUB_GENERAL if cfg.TRAIN.GENERAL_IS
                           else IS_THRESHOLD_CUB_FINETUNED))

        # Failure recovery: a SIGTERM/SIGINT requests a checkpoint at the
        # next step boundary, then a clean exit (the reference loses all
        # progress since the last manual snapshot; SURVEY.md section 5).
        stop_requested = {'flag': False}

        def _request_stop(signum, frame):
            print('signal %d: checkpointing at next step boundary' % signum)
            stop_requested['flag'] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _request_stop)
            except (ValueError, OSError):
                pass  # non-main thread

        count = int(np.asarray(state.step))
        total_steps = 0
        multi = jax.process_count() > 1
        compiled_step = None  # multi-host: AOT-compiled before the barrier
        for epoch in range(start_epoch, cfg.TRAIN.MAX_EPOCH):
            start_t = time.time()
            metrics = {}
            last_batch = None
            for step_i, host_batch in enumerate(self.data_loader):
                batch = self._device_batch(host_batch)
                last_batch = batch
                # host-built key: deterministic under resume (count comes
                # from state.step) and no per-step eager dispatch
                step_rng = _host_key(1, count)
                if cfg.TPU_PROFILE and epoch == start_epoch and step_i == 3:
                    jax.profiler.start_trace(
                        os.path.join(self.log_dir, 'profile'))
                if multi and compiled_step is None:
                    # Compile-THEN-barrier: jit compiles at first call, and
                    # with a warm compilation cache on one host only, that
                    # host would reach the step's first cross-process
                    # collective (fresh Gloo context, fixed ~30s key-value
                    # rendezvous deadline) minutes before its cold peer —
                    # observed as 'Gloo context initialization failed:
                    # GetKeyValue() timed out'. AOT-compile the step, THEN
                    # rendezvous (gRPC barrier, generous timeout), THEN
                    # execute; the compiled object serves every later step
                    # (shapes are constant: loaders drop_last like the
                    # reference, main.py:134).
                    compiled_step = step_fn.lower(
                        state, batch, step_rng).compile()
                    sync_processes('train_start')
                    # operational marker (every process): compiles done,
                    # barrier passed, steps about to execute — the
                    # multihost signal-stop smoke keys off this line
                    print('train: processes aligned', flush=True)
                state, metrics, step_fakes = (
                    compiled_step if compiled_step is not None
                    else step_fn)(state, batch, step_rng)
                if cfg.TPU_PROFILE and epoch == start_epoch and step_i == 7:
                    # sync by VALUE fetch: block_until_ready is a no-op
                    # on the tunneled backend (PERF.md pitfall 2)
                    float(metrics['errG'])
                    jax.profiler.stop_trace()
                count += 1
                total_steps += 1

                # every-N gate that really honors N: (step_i+1) % N == 0
                # fires after each N steps (N=2 -> steps 1,3,5.., the
                # reference's every-other-step cadence, cub_trainer:613),
                # and a huge N genuinely disables the stream — the old
                # `% N == 1` form fired at step 1 of every epoch for ANY N
                if scorer is not None and cfg.TPU_IS_EVERY > 0 and \
                        (step_i + 1) % cfg.TPU_IS_EVERY == 0:
                    # the step's own fakes, device-resident — one inception
                    # forward is the gate's only cost (the reference reuses
                    # its fakes the same way, cub_trainer:613-623)
                    scorer.add(step_fakes)
                if count % 100 == 0:
                    self.logger.log_scalars(
                        count, {k: float(v) for k, v in metrics.items()})
                stop_now = stop_requested['flag']
                if multi:
                    # The save below is a COLLECTIVE orbax write: a signal
                    # landing on a subset of processes (or between two
                    # hosts' step boundaries) must not send one process
                    # into the save while peers run the next step's pmean
                    # — mismatched collectives wedge the job. Reach
                    # consensus at a fixed poll cadence instead: every
                    # process allgathers its local flag at the same step
                    # and all act on max(flag) together.
                    stop_now = (total_steps % STOP_POLL_STEPS == 0 and
                                any_process_flag(stop_requested['flag']))
                if stop_now:
                    self.ckpt.save(state, epoch, prune=self.is_main)
                    print('checkpointed on signal; exiting train loop')
                    for sig, h in old_handlers.items():
                        signal.signal(sig, h)
                    return state
                if max_steps is not None and total_steps >= max_steps:
                    break
                if target_step is not None and count >= target_step:
                    break

            elapsed = time.time() - start_t
            m = {k: float(v) for k, v in metrics.items()}
            if self.is_main:
                print('[%d/%d][BN=%d][%d stages]\n'
                      '  Loss_D_all: %.2f match: %.2f uncond: %.2f cls: '
                      '%.2f\n'
                      '  Loss_G_all: %.2f match: %.2f uncond: %.2f cls: '
                      '%.2f\n'
                      '  KL_sen: %.2f KL_cls: %.2f  Time: %.2fs'
                      % (epoch, cfg.TRAIN.MAX_EPOCH, self.num_batches,
                         len(self.Ds), m.get('errD', 0),
                         m.get('errD_match', 0), m.get('errD_uncond', 0),
                         m.get('errD_cls', 0), m.get('errG', 0),
                         m.get('errG_match', 0), m.get('errG_uncond', 0),
                         m.get('errG_cls', 0), m.get('kl_sen', 0),
                         m.get('kl_cls', 0), elapsed))
                if 'std_sen_mean' in m:
                    # posterior-collapse watch, the reference's per-epoch
                    # mu/std dump (cub_trainer_splitz_cap_ca.py:655-656)
                    # reduced to batch+dim means
                    line = ('  Sentence mu/std (mean): %.4f / %.4f'
                            % (m['mu_sen_mean'], m['std_sen_mean']))
                    if 'std_cls_mean' in m:
                        line += ('  Class mu/std (mean): %.4f / %.4f'
                                 % (m['mu_cls_mean'], m['std_cls_mean']))
                    print(line)

            if last_batch is not None:
                # every process joins (the sampler forward is an SPMD
                # collective on multi-host); only process 0 writes files
                self._save_epoch_images(state, last_batch,
                                        _host_key(2, epoch), epoch)
            interval = cfg.TRAIN.SNAPSHOT_INTERVAL
            if epoch % interval == interval - 1 or epoch > 199:
                self.ckpt.save(state, epoch, prune=self.is_main)
                if self.is_main:
                    print('Snapshot: save model ok')

            if scorer is not None and scorer.count >= 3000:
                mean, std = scorer.score(num_splits=1)
                if self.is_main:
                    print('Epoch%d IS: %.3f +- %.3f'
                          % (epoch, mean, std))
                self.logger.log_scalars(count, {'inception_score': mean})
                self._is_gated_save(state, epoch, mean, threshold, scorer)
            elif cfg.TRAIN.BIG_EVAL:
                # Per-epoch eval over >=1000 fresh samples with a save gate
                # at 5.4 (cub_trainer_splitz_cap_ca.py:698-730).
                mean = self._big_eval(state, _host_key(3, epoch), n=1000)
                if self.is_main:
                    print('Epoch%d IS: %.3f' % (epoch, mean))
                self._is_gated_save(state, epoch, mean, 5.4,
                                    self._big_scorer)

            if max_steps is not None and total_steps >= max_steps:
                break
            if target_step is not None and count >= target_step:
                break
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        return state

    def _is_gated_save(self, state, epoch, mean, threshold, scorer):
        """Threshold-gated PROTECTED 'good model' save (the reference's
        absolute gates, cub_trainer_splitz_cap_ca.py:670-696), refused
        on random inception weights: an IS of 3.4+ from an unconverted
        tower is noise. The decision is process 0's, broadcast to every
        process: the orbax save is COLLECTIVE, while both the local IS
        mean (per-process prediction pools) and the real-weights flag
        (a per-host filesystem probe of T2I_INCEPTION_CKPT) can diverge
        across hosts — a gate branching on local state would send a
        subset of processes into the save while peers run the next
        step's collectives and wedge the job."""
        decision = bool(self.is_main and mean > threshold
                        and getattr(scorer, 'real_weights', False))
        if jax.process_count() > 1:
            decision = any_process_flag(decision)
        if decision:
            self.ckpt.save(state, epoch, protect=True, prune=self.is_main)
            if self.is_main:
                print('Saved good model')
        elif self.is_main and mean > threshold:
            print('IS %.3f above threshold but inception weights are '
                  'random — skipping good-model save '
                  '(set T2I_INCEPTION_CKPT)' % mean)

    def _make_is_scorer(self, dtype=jnp.bfloat16):
        """On-device IS predictions; random weights unless a converted
        checkpoint is present (scores then are relative-only).
        ``dtype=None`` builds the f32 tower (offline/direct scoring);
        the default bf16 serves the in-training relative gate."""
        from ..eval.convert_tf import random_inception_variables
        from ..eval.inception_score import InceptionScorer
        # GENERAL_IS uses the torchvision-flavor tower (reference
        # model.py:18-47); the fine-tuned path is TF-slim flavor.
        general = self.cfg.TRAIN.GENERAL_IS
        num_classes = 1000 if general else 51
        flavor = 'torch' if general else 'slim'
        ckpt = os.environ.get('T2I_INCEPTION_CKPT', '')
        real_weights = bool(ckpt and os.path.exists(ckpt))
        if real_weights:
            from ..eval.convert_tf import (load_slim_checkpoint,
                                           slim_vars_to_flax)
            variables = random_inception_variables(
                jax.random.PRNGKey(7), num_classes, flavor)
            variables = slim_vars_to_flax(
                load_slim_checkpoint(ckpt, num_classes), variables)
        else:
            variables = random_inception_variables(
                jax.random.PRNGKey(7), num_classes, flavor)
            print('!! Inception weights are random (no checkpoint found): '
                  'in-training IS is a relative signal only')
        # bf16 tower for the in-training gate (relative signal; ~26%
        # faster); offline eval scoring uses f32.
        scorer = InceptionScorer(variables, num_classes,
                                 finetuned=not general, flavor=flavor,
                                 dtype=dtype)
        # The absolute save thresholds (the reference's 3.4/5.5/6.0,
        # cub_trainer_splitz_cap_ca.py:670-696) only mean anything when
        # the tower carries the reference's trained weights — an IS of
        # 3.4 from a random-weight tower is noise, so the protect-save
        # gate checks this flag.
        scorer.real_weights = real_weights
        return scorer

    def _sample_like(self, state, batch, rng):
        """All-stage fake images with current params (epoch image grids and
        the BIG_EVAL path; the in-training IS stream reuses the step's own
        fakes instead — no extra G forward)."""
        g_vars = {'params': state.g_params,
                  'batch_stats': state.g_batch_stats}
        if not hasattr(self, '_train_sampler'):
            self._train_sampler = make_sample_fn(
                self.cfg, self.G, self.mesh, train_mode=True)
        bsz = batch['real'][0].shape[0]
        # host-side noise seeded from the key (no eager device op; the
        # jitted sampler call transfers it with the other args)
        seed = (int(np.asarray(rng)[0]) << 32) | int(np.asarray(rng)[1])
        noise = np.random.default_rng(seed).standard_normal(
            (bsz, self.cfg.GAN.Z_DIM), dtype=np.float32)
        if self.is_coco:
            return self._train_sampler(g_vars, rng, noise, batch['cond'])
        return self._train_sampler(g_vars, rng, noise, batch['txt'],
                                   batch['cls_onehot'])

    def _load_pth_generator(self, pth_path: str, state):
        """Reference .pth netG snapshot -> generator params/BN stats in the
        given TrainState (Ds/optimizers keep their fresh init, exactly the
        information a reference snapshot carries)."""
        from ..io_utils.torch_import import load_torch_generator
        g_vars = load_torch_generator(pth_path, {
            'params': state.g_params, 'batch_stats': state.g_batch_stats})
        ema = state.g_ema_params
        if ema is not None:
            # seed the average from the LOADED weights — the slot still
            # holds create_train_state's random-init copy, which would
            # otherwise be what eval scores / resume averages from
            ema = jax.tree.map(jnp.copy, g_vars['params'])
        return state.replace(g_params=g_vars['params'],
                             g_batch_stats=g_vars['batch_stats'],
                             g_ema_params=ema)

    def _load_pth_discriminators(self, net_d_prefix: str, state):
        """Reference netD<i>.pth snapshots -> our JointDNet params/BN stats
        (one file per branch, '%s%d.pth', cub_trainer:179-184)."""
        from ..io_utils.torch_import import load_torch_discriminator
        sizes = self.cfg.branch_sizes()
        d_params = list(state.d_params)
        d_stats = list(state.d_batch_stats)
        for i in range(len(self.Ds)):
            path = '%s%d.pth' % (net_d_prefix, i)
            d_vars = load_torch_discriminator(
                path, {'params': d_params[i], 'batch_stats': d_stats[i]},
                sizes[i])
            d_params[i] = d_vars['params']
            d_stats[i] = d_vars['batch_stats']
            print('Load D from: %s' % path)
        return state.replace(d_params=tuple(d_params),
                             d_batch_stats=tuple(d_stats))

    def _place_state(self, state):
        """Re-place restored arrays for the mesh: replicated on multi-device
        meshes, uncommitted on single-device (orbax restores arrays
        committed to one device, which conflicts with mesh-sharded batch
        inputs under jit)."""
        if self.num_shards > 1:
            from .state import place_state_on_mesh
            return place_state_on_mesh(self.cfg, self.mesh, state)
        return jax.tree.map(jnp.asarray, state)

    def _big_eval(self, state, rng, n: int = 1000) -> float:
        """Generate >= n samples over fresh loader batches and score IS
        (the reference's memory-heavy per-epoch eval path)."""
        if not hasattr(self, '_big_scorer'):
            self._big_scorer = self._make_is_scorer()
        scorer = self._big_scorer
        base = int(np.asarray(rng)[1])
        for bi, host_batch in enumerate(self.data_loader):
            if scorer.count > n:
                break
            batch = self._device_batch(host_batch)
            k = _host_key(4, base * 4096 + bi)  # no eager split per batch
            fakes = self._sample_like(state, batch, k)
            scorer.add(fakes[-1])
        mean, _ = scorer.score(num_splits=1)
        return mean

    @staticmethod
    def _host_local(arr) -> np.ndarray:
        """Process-local rows of a (possibly multi-host-sharded) array —
        np.asarray on a cross-host jax.Array raises; the grids only need
        this host's slice."""
        if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
            return np.concatenate(
                [np.asarray(s.data) for s in arr.addressable_shards],
                axis=0)
        return np.asarray(arr)

    def _save_epoch_images(self, state, batch, rng, epoch):
        # the sampler forward is collective on multi-host meshes — EVERY
        # process must execute it; only process 0 touches the filesystem
        fakes = self._sample_like(state, batch, rng)
        if not self.is_main:
            for f in fakes:
                self._host_local(f)  # participate in any cross-host fetch
            return
        real = self._host_local(batch['real'][-1])
        num = min(self.cfg.TRAIN.VIS_COUNT, real.shape[0])
        save_image_grid(real[:num], '%s/real_samples.png' % self.image_dir)
        for i, f in enumerate(fakes):
            save_image_grid(self._host_local(f)[:num],
                            '%s/epoch_%03d_fake_samples%d.png'
                            % (self.image_dir, epoch, i))

    # ------------------------------------------------------------------
    def evaluate(self, split_dir: str = 'test',
                 state=None, max_batches: Optional[int] = None):
        """Sampling loop (cub_trainer_splitz_cap_ca.py:776-911).

        When the eval config names a second generator checkpoint
        (``TRAIN.ENTITY_NET_G``, miscc/config.py:48) this routes to the
        reference's COCO-era two-path evaluate (trainer.py:711-838):
        G_NET + COND_G_NET on the same noise, product of hidden codes
        decoded through the shared toRGB heads. Only the offline CLI path
        (state is None) dispatches — the in-training sample grid never
        uses a second checkpoint.
        """
        cfg = self.cfg
        if state is None and cfg.TRAIN.ENTITY_NET_G:
            from .two_path import evaluate_two_path
            return evaluate_two_path(cfg, self.data_loader,
                                     self.output_dir, split_dir,
                                     max_batches=max_batches)
        if state is None:
            if not cfg.TRAIN.NET_G:
                print('Error: the path for models is not found!')
                return
            abstract = create_train_state(cfg, self.G, self.Ds,
                                          jax.random.PRNGKey(0),
                                          self.cond_width, mesh=self.mesh)
            if cfg.TRAIN.NET_G.endswith('.pth'):
                # reference-trained torch snapshot (eval configs point at
                # netG_*.pth, e.g. cfg/eval_birds.yml)
                state = self._place_state(self._load_pth_generator(
                    cfg.TRAIN.NET_G, abstract))
            else:
                # G-side-only restore: eval configs don't (and per the
                # reference, needn't) describe the discriminator tree the
                # checkpoint was trained with
                from ..io_utils.checkpoint import restore_generator_state
                state = self._place_state(
                    restore_generator_state(cfg.TRAIN.NET_G, abstract))
        from .state import eval_g_variables
        g_vars = eval_g_variables(state, use_ema=cfg.TPU_EMA_EVAL)
        sampler = make_sample_fn(cfg, self.G, self.mesh,
                                 train_mode=not cfg.TEST.EVAL_MODE)

        mode = 'evalmode' if cfg.TEST.EVAL_MODE else 'trainmode'
        save_dir = os.path.join(self.output_dir, self._eval_save_dir(mode))
        print('Save to %s' % save_dir)
        embedding_dim = 10
        # one draw per caption per pass — the standard StackGAN protocol the
        # reference hard-codes (cub_trainer_splitz_cap_ca.py:826); the
        # offline 30k-sample protocol (TEST.SAMPLE_NUM, miscc/config.py:32)
        # is reached by re-passing the test loader with fresh noise ids.
        sample_num = 1
        # manualSeed=100 at eval (main.py:88). Noise is drawn on the HOST
        # and sampler keys are host-built raw keys — like the reference's
        # eval loop, RNG costs nothing on the device and stays
        # reproducible independent of device count (PERF.md "Offline
        # sampling path").
        np_rng = np.random.default_rng(100)
        kseq = itertools.count()
        cls_share = cfg.TEST.CLS_PRIOR and cfg.TEST.CLS_SHARE
        single_pass = cfg.TEST.B_EXAMPLE or max_batches is not None
        target = (None if single_pass else
                  _local_sample_target(cfg.TEST.SAMPLE_NUM,
                                       jax.process_count()))

        # The offline protocol samples every caption with one vmapped
        # call per data batch (make_caption_sample_fn: per-caption BN
        # semantics, one dispatch + one uint8 fetch instead of ten);
        # B_EXAMPLE super grids keep the per-caption sampler.
        use_batched = not cfg.TEST.B_EXAMPLE
        if use_batched:
            pattern = ('cond' if self.is_coco else
                       'cls_share' if cls_share else 'cls')
            cap_sampler = make_caption_sample_fn(
                cfg, self.G, self.mesh,
                train_mode=not cfg.TEST.EVAL_MODE, pattern=pattern)
            # Data-parallel eval: commit the batch axis over the mesh so
            # the all-caption call partitions across chips (the
            # DataParallel role the reference's eval loop never had).
            # XLA inserts the cross-device reductions for the train-mode
            # BN statistics, so per-caption global-batch semantics are
            # preserved. Single-device meshes stay uncommitted (the AOT
            # SPMD pitfall, PERF.md #1); multi-host eval instead relies
            # on the loader's process striding (each host samples and
            # writes its own disjoint items).
            shard_eval = (self.num_shards > 1
                          and jax.process_count() == 1)
            sh_cb = sh_b = sh_r = None
            if shard_eval:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P
                from ..parallel.mesh import DATA_AXIS
                sh_cb = NamedSharding(self.mesh, P(None, DATA_AXIS))
                sh_b = NamedSharding(self.mesh, P(DATA_AXIS))
                sh_r = NamedSharding(self.mesh, P())

        # Direct on-device scoring (TPU_EVAL_DIRECT): the sampler's
        # all-caption uint8 stacks feed the metric towers in place —
        # sample -> IS/FID with zero PNG encode/decode and zero host
        # round trips per image (the protocol default stays the
        # reference-faithful disk path; measured 40.8 img/s with-save at
        # 256px on this host vs device-rate scoring here, PERF.md).
        direct = bool(cfg.TPU_EVAL_DIRECT)
        if direct and not use_batched:
            print('!! TPU_EVAL_DIRECT ignored: TEST.B_EXAMPLE super '
                  'grids always write image files')
            direct = False
        is_scorer = fid_scorer = None
        if direct:
            is_scorer = self._make_is_scorer(dtype=None)  # f32 offline
            if cfg.TPU_EVAL_FID_STATS:
                from ..eval.fid import FIDScorer
                pb = os.environ.get('T2I_FID_PB', '')
                if pb and os.path.exists(pb):
                    fid_scorer = FIDScorer.from_frozen_pb(pb)
                else:
                    from ..eval.convert_tf import random_inception_variables
                    fid_scorer = FIDScorer(random_inception_variables(
                        jax.random.PRNGKey(0), 1008, 'fid'), 1008,
                        flavor='fid')
                    print('!! random FID tower (no $T2I_FID_PB): FID is '
                          'relative-only')

        count = 0
        nid_base = 0
        done = False
        # Cross-batch pipeline: dispatch batch b's all-caption call, then
        # fetch + PNG-encode batch b-1 while b samples on device (the
        # native writer encodes off the GIL). Depth 1 bounds device
        # memory to two all-caption uint8 batches (~60 MB at bs64/128px).
        pending = []  # (device [C,B,H,W,3] uint8, filenames, cls, nid,
        #                n_keep captions — the last batch of the 30k
        #                protocol may stop at caption granularity so the
        #                PNG count lands exactly on TEST.SAMPLE_NUM)

        def _drain(limit):
            while len(pending) > limit:
                dev, names, pcls, nid, keep = pending.pop(0)
                if direct:
                    # metric towers consume the device-resident stack;
                    # nothing crosses to the host until score()
                    for si in range(keep):
                        is_scorer.add_uint8_row(dev, si)
                        if fid_scorer is not None:
                            fid_scorer.add_uint8_row(dev, si)
                    continue
                arr = np.asarray(dev)
                for si in range(keep):
                    save_single_images(arr[si], names, save_dir,
                                       split_dir, si, pcls,
                                       cfg.imsize, nid)

        while not done:
            pass_start_count = count
            for step, data in enumerate(self.data_loader):
                if max_batches is not None and step >= max_batches:
                    break
                embeddings = np.asarray(data['embeddings'], np.float32)
                cls = np.asarray(data['cls'])
                if not self.is_coco:
                    cls0 = cls - 1
                    cls_onehot = np.eye(cfg.GAN.ENTITY_DIM,
                                        dtype=np.float32)[cls0]
                bsz = embeddings.shape[0]
                if self.is_coco:
                    # filename class token: first active category id. The
                    # reference's coco test path indexes its class dict
                    # by position and crashes (SURVEY §5 "half-broken");
                    # a deterministic per-item id keeps the reference
                    # filename scheme meaningful.
                    file_cls = np.asarray(cls).argmax(1) + 1
                else:
                    # the reference writes 0-BASED ids into filenames
                    # (cls-=1 before save_singleimages,
                    # cub_trainer_splitz_cap_ca.py:849)
                    file_cls = cls0
                noise = np_rng.standard_normal(
                    (bsz, cfg.GAN.Z_DIM), dtype=np.float32)
                if cls_share:
                    # the 10 captions share one fixed class prior
                    shared_prior = np_rng.standard_normal(
                        (bsz, cfg.GAN.MANIFD_DIM), dtype=np.float32)

                n_cap = min(embedding_dim, embeddings.shape[1])
                if use_batched:
                    do_shard = shard_eval and bsz % self.num_shards == 0

                    def put(x, sh):
                        # commit over the mesh; numpy passthrough on a
                        # single device / indivisible batch
                        return (jax.device_put(x, sh) if do_shard
                                else np.asarray(x))

                    # [B, C, E] -> [C, B, E] caption-major for the vmap
                    emb_host = np.ascontiguousarray(
                        embeddings[:, :n_cap, :].transpose(1, 0, 2))
                    for j in range(sample_num):
                        keys = np.stack([_host_key(100, next(kseq))
                                         for _ in range(n_cap)])
                        if sample_num > 1:
                            # distinct noise per (caption, noise_id), as
                            # the reference redraws per inner iteration
                            noise_all = np_rng.standard_normal(
                                (n_cap, bsz, cfg.GAN.Z_DIM),
                                dtype=np.float32)
                        else:
                            # one draw per batch shared by all captions
                            noise_all = np.broadcast_to(
                                noise, (n_cap,) + noise.shape)
                        if do_shard:
                            keys = put(keys, sh_r)
                            noise_all = put(noise_all, sh_cb)
                        if self.is_coco:
                            cond_all = put(np.concatenate(
                                [emb_host, np.broadcast_to(
                                    np.asarray(cls, np.float32),
                                    (n_cap,) + cls.shape)], axis=2), sh_cb)
                            out = cap_sampler(g_vars, keys, noise_all,
                                              cond_all)
                        elif cls_share:
                            # netG(noise, emb, cls_prior=prior)
                            # (cub_trainer_splitz_cap_ca.py:876-877)
                            out = cap_sampler(g_vars, keys, noise_all,
                                              put(emb_host, sh_cb), None,
                                              put(shared_prior, sh_b))
                        else:
                            out = cap_sampler(g_vars, keys, noise_all,
                                              put(emb_host, sh_cb),
                                              put(cls_onehot, sh_b))
                        if target is not None:
                            keep = min(n_cap, max(
                                0, -(-(target - count) // bsz)))
                        else:
                            keep = n_cap
                        if keep:
                            pending.append((out, data['key'], file_cls,
                                            nid_base + j, keep))
                            count += bsz * keep
                        _drain(1)
                else:
                    fake_img_list = []
                    for i in range(n_cap):
                        for j in range(sample_num):
                            if sample_num > 1:
                                noise = np_rng.standard_normal(
                                    (bsz, cfg.GAN.Z_DIM), dtype=np.float32)
                            k_s = _host_key(100, next(kseq))
                            emb_i = embeddings[:, i, :]
                            if self.is_coco:
                                cond = np.concatenate(
                                    [emb_i, np.asarray(cls, np.float32)],
                                    axis=1)
                                fakes = sampler(g_vars, k_s, noise, cond)
                            elif cls_share:
                                fakes = sampler(g_vars, k_s, noise, emb_i,
                                                None, shared_prior)
                            else:
                                fakes = sampler(g_vars, k_s, noise, emb_i,
                                                cls_onehot)
                            fake_img_list.append(np.asarray(fakes[-1]))
                    save_super_images(fake_img_list, data['key'], save_dir,
                                      split_dir, 256)
                print('[%d/%d]' % (step, self.num_batches))
                if target is not None and count >= target:
                    break
            if count == pass_start_count and not single_pass:
                # a full loader pass produced nothing (drop_last with a
                # split smaller than the batch, or an over-strided
                # multi-host shard): looping again would spin forever
                print('!! eval loader yielded no batches — stopping at '
                      '%d images (target %s)' % (count, target))
                break
            done = single_pass or target is None or count >= target
            nid_base += sample_num
        _drain(0)
        if direct:
            import json
            if count == 0:
                # mirror the PNG path's graceful empty outcome (loader
                # smaller than a batch under drop_last, or max_batches
                # 0) — but keep the documented contract: the eval dir
                # exists and direct_scores.json says what happened
                os.makedirs(save_dir, exist_ok=True)
                with open(os.path.join(save_dir, 'direct_scores.json'),
                          'w') as f:
                    json.dump({'images': 0}, f, indent=1)
                print('Direct eval: 0 images sampled — no scores')
                return save_dir
            splits = 10 if count >= 100 else 1  # the is_of_dir default
            mean, std = is_scorer.score(num_splits=splits)
            result = {'images': count, 'is_mean': mean, 'is_std': std,
                      'is_splits': splits,
                      'real_is_weights': bool(
                          getattr(is_scorer, 'real_weights', False))}
            if jax.process_count() > 1:
                # each process pools only its loader stride; the PNG
                # protocol scores the union DIRECTORY afterwards, so a
                # multi-host direct score is explicitly process-local
                result['scope'] = 'process_local'
                result['process'] = jax.process_index()
                print('!! multi-host direct eval: scores cover this '
                      "process's shard only (scope=process_local)")
            if fid_scorer is not None:
                result['fid'] = fid_scorer.accumulated_fid_against_stats(
                    cfg.TPU_EVAL_FID_STATS)
            os.makedirs(save_dir, exist_ok=True)
            name = ('direct_scores.json' if jax.process_count() == 1 else
                    'direct_scores.p%d.json' % jax.process_index())
            with open(os.path.join(save_dir, name), 'w') as f:
                json.dump(result, f, indent=1)
            print('Direct eval (no PNG round trip): IS %.4f +- %.4f over '
                  '%d images%s' % (mean, std, count,
                                   (' FID %.4f' % result['fid'])
                                   if 'fid' in result else ''))
            return save_dir
        write_errors = flush_writes()  # join the async native PNG writer
        if write_errors:
            # the printed count is the number an operator reads off the
            # log — report images actually ON DISK, not attempts (each
            # sampled image maps 1:1 to one PNG write)
            print('!! %d image writes failed' % write_errors)
            print('Save images DONE WITH ERRORS; Number of images '
                  'written: %d (of %d sampled)'
                  % (count - write_errors, count))
        else:
            print('Save images ok; Number of images: %d' % count)
        return save_dir

    def _eval_save_dir(self, mode: str) -> str:
        """Reference eval dir naming: eval/Testset_<mode>_fixednoise
        [_clsprior-{share,random}]_<epoch>_<run>, where <epoch> comes from
        the NET_G filename and <run> from its grandparent directory
        (cub_trainer_splitz_cap_ca.py:829-845)."""
        import re
        cfg = self.cfg
        net_g = (cfg.TRAIN.NET_G or '').rstrip('/')
        base = os.path.basename(net_g)
        stem = base[:-4] if base.endswith('.pth') else base
        m = re.search(r'(\d+)$', stem)
        epoch_tok = m.group(1) if m else (stem.split('_')[-1] or '0')
        parts = net_g.split('/')
        run_tok = parts[-3] if len(parts) >= 3 else (
            os.path.basename(os.path.abspath(self.output_dir)) or 'run')
        if cfg.TEST.CLS_PRIOR:
            prior_tok = ('clsprior-share' if cfg.TEST.CLS_SHARE
                         else 'clsprior-random')
            name = 'Testset_%s_fixednoise_%s_%s_%s' % (
                mode, prior_tok, epoch_tok, run_tok)
        else:
            name = 'Testset_%s_fixednoise_%s_%s' % (mode, epoch_tok, run_tok)
        return os.path.join('eval', name)
