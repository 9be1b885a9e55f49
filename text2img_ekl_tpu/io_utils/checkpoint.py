"""Orbax checkpointing of the full TrainState.

The reference saves only ``netG.state_dict()`` and drops optimizer state on
resume (cub_trainer_splitz_cap_ca.py:662-667, SURVEY.md section 5). Here the
whole TrainState (G/D params, BN stats, Adam states, step) round-trips, and
the epoch-in-filename convention (netG_epoch%d) is preserved so resume can
parse the position the same way (cub_trainer_splitz_cap_ca.py:170-184).
"""

from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp


def _abspath(p: str) -> str:
    return os.path.abspath(os.path.expanduser(p))


def save_train_state(path: str, state) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(_abspath(path), state, force=True)
    ckptr.wait_until_finished()


def _ema_slot_in_checkpoint(path: str):
    """True/False if the checkpoint's ``g_ema_params`` presence can be
    probed from orbax metadata (cheap — no array reads), None if not."""
    try:
        md = ocp.StandardCheckpointer().metadata(_abspath(path))
        tree = md.item_metadata.tree
        if not isinstance(tree, dict) or 'g_params' not in tree:
            return None
        return tree.get('g_ema_params') is not None
    except Exception:
        return None


def restore_train_state(path: str, target):
    """Restore into the structure of ``target`` (an abstract or concrete
    TrainState).

    The generator-EMA slot is aligned FIRST-CLASS before the strict
    restore: checkpoints written by an averaged run (TPU_EMA_DECAY>0)
    are routinely restored under configs that never set the flag (the
    default eval/resume ymls), and vice versa. The slot's presence is
    probed from orbax metadata and the template adjusted so the strict
    restore succeeds — averages restore into a slot-less template (the
    reference's save_model bakes avg_param_G into the .pth, so an
    averaged run's eval weights ARE the averages), and a newly-enabled
    EMA seeds from the restored weights like copy_G_params at train
    start (cub_trainer_splitz_cap_ca.py:83,218-228).

    If the strict restore still fails because the checkpoint was written
    under a different ZeRO-1 topology (TPU_SHARDED_ADAM moment vectors
    are padded to the device count, so their length depends on the mesh;
    or the flag was flipped since), the checkpoint is re-read raw and the
    optimizer moments are migrated bit-exactly
    (train/state.migrate_opt_state)."""
    import jax

    seed_ema_from_restored = False
    if hasattr(target, 'g_ema_params'):
        has_ema = _ema_slot_in_checkpoint(path)
        if has_ema is True and target.g_ema_params is None:
            # template for shapes/dtypes/sharding only; values come from
            # the checkpoint
            target = target.replace(g_ema_params=target.g_params)
        elif has_ema is False and target.g_ema_params is not None:
            target = target.replace(g_ema_params=None)
            seed_ema_from_restored = True

    ckptr = ocp.StandardCheckpointer()
    try:
        out = ckptr.restore(_abspath(path), target=target)
    except Exception as e:  # shape/structure mismatch -> topology migration
        if not hasattr(target, 'g_opt_state'):
            raise
        try:
            return _restore_migrating_topology(path, target)
        except Exception as e2:
            raise RuntimeError(
                'checkpoint restore failed (%s) and topology migration '
                'also failed (%s)' % (e, e2)) from e
    if seed_ema_from_restored:
        out = out.replace(
            g_ema_params=jax.tree.map(jax.numpy.copy, out.g_params))
    return out


def _refit(raw_sub, tgt_sub, what: str = 'subtree'):
    """Same logical structure, possibly list-vs-tuple / dict-vs-class
    containers after a raw restore: refit leaves onto the target's
    treedef. Leaf SHAPES are validated against the target — unflatten
    alone checks only leaf count, so a different G architecture that
    happens to have the same number of tensors would otherwise restore
    silently mis-shaped/permuted params that fail obscurely (or not at
    all) at apply time. Dtypes are cast to the target's (a checkpoint
    written under a different TPU_BN_DTYPE is a legitimate precision
    flip, not a mismatch)."""
    import jax
    import jax.numpy as jnp

    raw_leaves = jax.tree.leaves(raw_sub)
    tgt_leaves = jax.tree.leaves(tgt_sub)
    if len(raw_leaves) != len(tgt_leaves):
        raise ValueError(
            'checkpoint %s has %d tensors but this config expects %d — '
            'the checkpoint was written under a different architecture'
            % (what, len(raw_leaves), len(tgt_leaves)))
    fitted = []
    for i, (r, t) in enumerate(zip(raw_leaves, tgt_leaves)):
        if tuple(np.shape(r)) != tuple(np.shape(t)):
            raise ValueError(
                'checkpoint %s leaf %d has shape %s but this config '
                'expects %s — the checkpoint was written under a '
                'different architecture'
                % (what, i, tuple(np.shape(r)), tuple(np.shape(t))))
        dt = getattr(t, 'dtype', None)
        if dt is not None and getattr(r, 'dtype', None) != dt:
            r = jnp.asarray(r, dt)
        fitted.append(r)
    return jax.tree.unflatten(jax.tree.structure(tgt_sub), fitted)


def _raw_generator_subtrees(path: str):
    """Raw G-side subtrees of a full-TrainState checkpoint, reading ONLY
    what evaluate()/export need: step, g_params, g_batch_stats and (when
    present) g_ema_params. An orbax partial restore keyed off the
    checkpoint's own metadata skips the discriminator params and every
    Adam moment vector — the bulk of the state on disk. Falls back to a
    full raw StandardCheckpointer read if the partial path is
    unavailable."""
    import jax

    p = _abspath(path)
    try:
        ctr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        md = ctr.metadata(p).item_metadata
        keys = ['step', 'g_params', 'g_batch_stats']
        try:
            if md['g_ema_params'] is not None:
                keys.append('g_ema_params')
        except (KeyError, TypeError):
            pass
        item = {k: jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), md[k])
            for k in keys}
        raw = ctr.restore(p, args=ocp.args.PyTreeRestore(
            item=item, partial_restore=True))
        raw.setdefault('g_ema_params', None)
        return raw
    except Exception:
        return ocp.StandardCheckpointer().restore(p)


def restore_generator_state(path: str, target):
    """Generator-side restore for evaluate(): g_params, g_batch_stats and
    the EMA slot from the checkpoint; discriminators and optimizer states
    keep the target's fresh init (and are never read from disk — see
    _raw_generator_subtrees).

    The reference's eval path loads ONLY netG (.pth,
    cub_trainer_splitz_cap_ca.py:784-800) — its eval configs never
    specify the D-side architecture (D_CAPSULE, CAT_Z widths...), so an
    eval-config TrainState template routinely has a different
    discriminator tree than the training checkpoint. A strict full-state
    restore would reject exactly the checkpoints the eval workflow
    exists for; refit just the G side instead (leaves reattached to the
    template's treedef, with per-leaf shape validation)."""
    import jax

    raw = _raw_generator_subtrees(path)
    out = target.replace(
        step=jax.numpy.asarray(raw['step']),
        g_params=_refit(raw['g_params'], target.g_params, 'g_params'),
        g_batch_stats=_refit(raw['g_batch_stats'], target.g_batch_stats,
                             'g_batch_stats'))
    if raw.get('g_ema_params') is not None:
        # an averaged run's eval weights ARE the averages (the reference
        # bakes avg_param_G into the .pth, see restore_train_state)
        out = out.replace(
            g_ema_params=_refit(raw['g_ema_params'], target.g_params,
                                'g_ema_params'))
    elif target.g_ema_params is not None:
        # EMA enabled by the eval config but absent from the checkpoint:
        # the template slot holds create_train_state's fresh random init —
        # with the default TPU_EMA_EVAL=True, leaving it in place would
        # silently evaluate/export random weights. Seed the slot from the
        # RESTORED live weights (mirrors restore_train_state /
        # _restore_migrating_topology).
        out = out.replace(
            g_ema_params=jax.tree.map(jax.numpy.copy, out.g_params))
    return out


def _restore_migrating_topology(path: str, target):
    import jax

    from ..train.state import migrate_opt_state

    raw = ocp.StandardCheckpointer().restore(_abspath(path))
    refit = _refit

    g_params = refit(raw['g_params'], target.g_params)
    d_params = tuple(refit(r, t) for r, t in zip(raw['d_params'],
                                                 target.d_params))
    out = target.replace(
        step=jax.numpy.asarray(raw['step']),
        g_params=g_params,
        g_batch_stats=refit(raw['g_batch_stats'], target.g_batch_stats),
        g_opt_state=migrate_opt_state(raw['g_opt_state'],
                                      target.g_opt_state, g_params),
        d_params=d_params,
        d_batch_stats=tuple(refit(r, t) for r, t in zip(
            raw['d_batch_stats'], target.d_batch_stats)),
        d_opt_states=tuple(
            migrate_opt_state(r, t, p) for r, t, p in zip(
                raw['d_opt_states'], target.d_opt_states, d_params)),
    )
    if raw.get('g_ema_params') is not None:
        # The averages are part of the trained state: restore them even
        # when the template lacks the slot (an eval/resume config that
        # never sets TPU_EMA_DECAY) — the reference's save_model bakes
        # avg_param_G into the .pth, so a reference eval of an averaged
        # run inherently scores the averages. TPU_EMA_EVAL=False is the
        # way to score live weights, never a config-shape accident.
        out = out.replace(g_ema_params=refit(raw['g_ema_params'],
                                             g_params))
    elif target.g_ema_params is not None:
        # EMA newly enabled on an older checkpoint: seed the average
        # from the RESTORED weights (the template's fresh-init copy
        # would be stale), like copy_G_params at train start.
        out = out.replace(
            g_ema_params=jax.tree.map(jax.numpy.copy, g_params))
    print('!! checkpoint written under a different topology/structure — '
          'state migrated (ZeRO-1 moments unpad -> repad, EMA slot '
          'seeded/restored) for this configuration')
    return out


def parse_epoch_from_path(path: str) -> int:
    """'netG_epoch123' / 'netG_123.pth'-style suffix -> 124 (next count),
    mirroring cub_trainer_splitz_cap_ca.py:175-178."""
    m = re.search(r'(\d+)(?:\.[a-z]+)?$', path.rstrip('/'))
    return int(m.group(1)) + 1 if m else 0


class CheckpointManager:
    """Epoch-indexed checkpoint directory: <model_dir>/state_epoch<N>
    (the reference's netG_epoch%d convention, but holding the FULL
    TrainState; save is collective on multi-host runs).

    ``keep`` bounds disk: after each save the oldest unprotected
    snapshots beyond the newest ``keep`` are deleted (0 = keep all, the
    reference's never-delete behavior). ``save(..., protect=True)``
    (the trainer's IS-gated "good model" saves) writes a sidecar
    ``.protect_epoch<N>`` marker exempting that epoch forever. On a
    multi-host job the orbax save itself is collective on every
    process, but the manager's filesystem bookkeeping — the sidecar
    write AND pruning — must run on process 0 only (N processes
    opening the same sidecar for write on a shared filesystem can
    surface transient create/lock errors); the trainer passes
    ``prune=is_main`` and both are gated on it."""

    def __init__(self, model_dir: str, keep: int = 0):
        self.model_dir = _abspath(model_dir)
        self.keep = keep
        os.makedirs(self.model_dir, exist_ok=True)

    def path(self, epoch: int) -> str:
        return os.path.join(self.model_dir, 'state_epoch%d' % epoch)

    def save(self, state, epoch: int, protect: bool = False,
             prune: bool = True) -> str:
        p = self.path(epoch)
        save_train_state(p, state)
        if protect and prune:  # fs bookkeeping: process-0-only, see class doc
            with open(os.path.join(self.model_dir,
                                   '.protect_epoch%d' % epoch), 'w'):
                pass
        if prune:
            self._prune()
        return p

    def _epochs(self):
        out = []
        for name in os.listdir(self.model_dir):
            m = re.match(r'state_epoch(\d+)$', name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _prune(self) -> None:
        if self.keep <= 0:
            return
        import shutil
        epochs = self._epochs()
        protected = {e for e in epochs if os.path.exists(
            os.path.join(self.model_dir, '.protect_epoch%d' % e))}
        unprotected = [e for e in epochs if e not in protected]
        for e in unprotected[:-self.keep]:
            shutil.rmtree(self.path(e), ignore_errors=True)

    def latest(self) -> Optional[str]:
        if not os.path.isdir(self.model_dir):
            return None
        best = None
        best_n = -1
        for name in os.listdir(self.model_dir):
            m = re.match(r'state_epoch(\d+)$', name)
            if m and int(m.group(1)) > best_n:
                best_n = int(m.group(1))
                best = os.path.join(self.model_dir, name)
        return best

    def restore(self, target, path: Optional[str] = None):
        p = path or self.latest()
        if p is None:
            return None
        return restore_train_state(p, target)
