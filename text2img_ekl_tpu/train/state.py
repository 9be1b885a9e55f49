"""Full training state as one pytree.

The reference checkpoints only the generator's weights and loses optimizer
state on resume (SURVEY.md section 5; cub_trainer_splitz_cap_ca.py:662-667).
Here the complete state — G/D params, BatchNorm statistics, both Adam states
and the step counter — is a single flax struct, checkpointable with orbax
and donate-able through the fused train step.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import flax
import jax
import jax.numpy as jnp
import optax


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam(lr, betas=(0.5, 0.999)) as the reference configures it
    (cub_trainer_splitz_cap_ca.py:199-215)."""
    return optax.adam(lr, b1=0.5, b2=0.999, eps=1e-8)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    g_params: Any
    g_batch_stats: Any
    g_opt_state: Any
    d_params: Tuple[Any, ...]
    d_batch_stats: Tuple[Any, ...]
    d_opt_states: Tuple[Any, ...]
    # EMA of g_params (the reference's avg_param_G slot,
    # cub_trainer_splitz_cap_ca.py:80-85,218-228; its in-loop update is
    # disabled there, so decay=0 — state None — is the faithful default).
    g_ema_params: Any = None


def eval_g_variables(state: TrainState, use_ema: bool = True):
    """Generator variables for offline sampling/eval/export.

    When the state carries EMA weights, they are what an EMA run
    evaluates: the reference's ``save_model`` writes ``avg_param_G`` into
    the netG ``.pth`` before saving (cub_trainer_splitz_cap_ca.py:218-228),
    so a reference eval of an averaged run inherently scores the averages.
    BatchNorm running stats are always the live buffers —
    ``copy_G_params`` covers only ``.parameters()``, never buffers
    (cub_trainer_splitz_cap_ca.py:83-88).
    """
    params = state.g_params
    if use_ema and state.g_ema_params is not None:
        params = state.g_ema_params
    return {'params': params, 'batch_stats': state.g_batch_stats}


def resolve_restored_ema(state: TrainState, ema_decay: float) -> TrainState:
    """EMA-slot policy for a TRAINING run after restore.

    A restored EMA slot with averaging disabled (TPU_EMA_DECAY=0) would
    stay FROZEN at its checkpointed values — the step only updates the
    averages when decay > 0 — while being re-saved into every snapshot,
    and eval/export with the default TPU_EMA_EVAL would then silently
    prefer those stale weights over the trained model. Drop the slot
    loudly instead; evaluate() of a finished averaged run (no further
    training) still scores the averages via eval_g_variables."""
    if state.g_ema_params is not None and float(ema_decay) <= 0:
        print('!! checkpoint carries generator EMA averages but '
              'TPU_EMA_DECAY=0: dropping them for this training run so '
              'snapshots hold live weights (set TPU_EMA_DECAY>0 to '
              'continue averaging)')
        return state.replace(g_ema_params=None)
    return state


def zero1_shard_count(cfg, mesh) -> int:
    """Number of weight-update shards (1 = replicated Adam). Sharding is
    only active for TPU_SHARDED_ADAM on a multi-device shard_map mesh."""
    if (mesh is not None and mesh.devices.size > 1
            and getattr(cfg, 'TPU_SHARDED_ADAM', False)
            and getattr(cfg, 'TPU_SPMD_MODE', 'shard_map') == 'shard_map'):
        return int(mesh.devices.size)
    return 1


def _opt_init(tx, params, n_shards: int):
    """Optimizer state: full tree when replicated; one GLOBAL flat moment
    vector (padded to n_shards) when weight-update sharding is on — the
    shard_map in_specs then slice it 1/N per device (ZeRO-1)."""
    if n_shards <= 1:
        return tx.init(params)
    from jax.flatten_util import ravel_pytree
    flat, _ = ravel_pytree(params)
    padded = flat.size + ((-flat.size) % n_shards)
    return tx.init(jnp.zeros((padded,), flat.dtype))


def place_state_on_mesh(cfg, mesh, state: TrainState) -> TrainState:
    """Re-place a (restored) TrainState for a multi-device mesh:
    everything replicated, EXCEPT the ZeRO-1 flat moment vectors when
    TPU_SHARDED_ADAM is on — those live sharded over the data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import DATA_AXIS, sync_processes
    # On a multi-process mesh the replicated device_put below runs
    # multihost assert_equal — often the job's FIRST cross-process
    # collective, ahead of any compile-then-barrier around the step.
    # Per-process skew from cold-vs-warm compiles can exceed Gloo's
    # fixed ~30s rendezvous deadline (observed on the 4-process CPU
    # dryrun leg under host contention); rendezvous over gRPC first so
    # the placement collective fires aligned. No-op single-process.
    sync_processes('state_placement')
    rep = NamedSharding(mesh, P())
    if zero1_shard_count(cfg, mesh) <= 1:
        return jax.tree.map(lambda x: jax.device_put(x, rep), state)
    shd = NamedSharding(mesh, P(DATA_AXIS))

    def place_opt(t):
        return jax.tree.map(
            lambda x: jax.device_put(x, shd if getattr(x, 'ndim', 0) >= 1
                                     else rep), t)

    # Place the opt states sharded FIRST (never replicate the moment
    # vectors, even transiently — that spike is exactly what ZeRO-1
    # avoids), then replicate everything else.
    rest = state.replace(g_opt_state=None, d_opt_states=())
    rest = jax.tree.map(lambda x: jax.device_put(x, rep), rest)
    return rest.replace(
        g_opt_state=place_opt(state.g_opt_state),
        d_opt_states=tuple(place_opt(o) for o in state.d_opt_states))


def _opt_moment_vectors(opt_state, params):
    """Canonical (count, mu_flat, nu_flat) from an Adam state in EITHER
    format — replicated tree (mu/nu shaped like params) or ZeRO-1 global
    flat vectors padded to some device count. Works on raw orbax restores
    (nested dicts/lists) as well as live optax states: tree leaves come
    out in (count, mu..., nu...) order either way (NamedTuple field order
    == sorted dict keys for ScaleByAdamState)."""
    import numpy as np
    leaves = [np.asarray(l) for l in jax.tree.leaves(opt_state)]
    scalars = [l for l in leaves if l.ndim == 0]
    arrs = [l for l in leaves if l.ndim >= 1]
    pleaves = jax.tree.leaves(params)
    true_size = sum(int(np.prod(l.shape)) for l in pleaves)
    if (len(arrs) == 2 and len(pleaves) != 2
            and all(a.ndim == 1 and a.size >= true_size for a in arrs)):
        mu, nu = arrs[0][:true_size], arrs[1][:true_size]
    else:
        n = len(pleaves)
        assert len(arrs) == 2 * n, (len(arrs), n)
        mu = np.concatenate([a.ravel() for a in arrs[:n]])
        nu = np.concatenate([a.ravel() for a in arrs[n:]])
        assert mu.size == true_size
    return scalars[0], mu, nu


def migrate_opt_state(raw_opt, target_opt, params):
    """Adapt an Adam state saved under a DIFFERENT ZeRO-1 topology (other
    mesh size, or TPU_SHARDED_ADAM flipped) to the current format.

    The flat moment vectors are padded to the device count at save time,
    so a checkpoint is otherwise topology-locked; this unpads to the true
    parameter size and re-pads (or un/re-ravels for flag flips). Moments
    are preserved bit-exactly modulo the zero padding.
    """
    import numpy as np
    count, mu, nu = _opt_moment_vectors(raw_opt, params)
    tgt_leaves, treedef = jax.tree.flatten(target_opt)
    pleaves = jax.tree.leaves(params)
    arr_ix = [i for i, l in enumerate(tgt_leaves)
              if getattr(l, 'ndim', 0) >= 1]
    new = list(tgt_leaves)
    for i, l in enumerate(tgt_leaves):
        if getattr(l, 'ndim', 0) == 0:
            new[i] = jnp.asarray(count, l.dtype)
    if len(arr_ix) == 2 and len(pleaves) != 2:  # target: flat ZeRO-1
        padded = int(tgt_leaves[arr_ix[0]].size)
        for ix, vec in zip(arr_ix, (mu, nu)):
            new[ix] = jnp.asarray(
                np.pad(vec, (0, padded - vec.size)),
                tgt_leaves[ix].dtype)
    else:  # target: replicated tree — split per params leaf, in order
        n = len(pleaves)
        assert len(arr_ix) == 2 * n
        sizes = [int(np.prod(l.shape)) for l in pleaves]
        offs = np.cumsum([0] + sizes)
        for half, vec in ((0, mu), (1, nu)):
            for j in range(n):
                ix = arr_ix[half * n + j]
                new[ix] = jnp.asarray(
                    vec[offs[j]:offs[j + 1]].reshape(
                        tgt_leaves[ix].shape),
                    tgt_leaves[ix].dtype)
    return jax.tree.unflatten(treedef, new)


def create_train_state(cfg, G, Ds, rng, cond_width: int,
                       mesh=None) -> TrainState:
    """Initialize G/D variables and optimizer states for a config.

    ``cond_width`` is the width of the condition code fed to the joint
    discriminators (cat of mus under CAT_Z='concat'). ``mesh`` is only
    needed when TPU_SHARDED_ADAM shards the weight update.
    """
    n_shards = zero1_shard_count(cfg, mesh)
    bs = 2  # init shapes don't affect params; keep tracing cheap
    sizes = cfg.branch_sizes()
    k_g, k_d, k_r = jax.random.split(rng, 3)

    noise = jnp.zeros((bs, cfg.GAN.Z_DIM), jnp.float32)
    rngs = {'params': k_g, 'reparam': k_r, 'cls_prior': k_r}
    g_init = jax.jit(functools.partial(G.init, train=True,
                                       method='init_all'))
    if type(G).__name__ == 'GNet':
        if getattr(G, 'b_condition', True):
            txt = jnp.zeros((bs, cfg.TEXT.DIMENSION), jnp.float32)
            g_vars = g_init(rngs, noise, txt)
        else:  # B_CONDITION=False: netG(noise) alone (model.py:768-771)
            g_vars = g_init(rngs, noise)
    elif type(G).__name__ == 'CondGNet':
        cond = jnp.zeros((bs, G.cond_dim), jnp.float32)
        g_vars = g_init(rngs, noise, cond)
    else:  # CondGNetCatZ / CondGNetCatZCA
        sen = jnp.zeros((bs, cfg.TEXT.DIMENSION), jnp.float32)
        cls = jnp.zeros((bs, cfg.GAN.ENTITY_DIM), jnp.float32)
        g_vars = g_init(rngs, noise, sen, cls)

    d_params, d_stats, d_opts = [], [], []
    for D, size in zip(Ds, sizes):
        img = jnp.zeros((bs, size, size, 3), jnp.float32)
        cond = jnp.zeros((bs, cond_width), jnp.float32)
        k_d, k = jax.random.split(k_d)
        d_vars = jax.jit(functools.partial(D.init, train=True))(
            {'params': k}, img, cond)
        d_params.append(d_vars['params'])
        d_stats.append(d_vars.get('batch_stats', {}))
        d_opts.append(_opt_init(make_optimizer(cfg.TRAIN.DISCRIMINATOR_LR),
                                d_vars['params'], n_shards))

    g_opt = _opt_init(make_optimizer(cfg.TRAIN.GENERATOR_LR),
                      g_vars['params'], n_shards)
    ema_decay = getattr(cfg, 'TPU_EMA_DECAY', 0.0)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_vars['params'],
        g_batch_stats=g_vars.get('batch_stats', {}),
        g_opt_state=g_opt,
        d_params=tuple(d_params),
        d_batch_stats=tuple(d_stats),
        d_opt_states=tuple(d_opts),
        g_ema_params=jax.tree.map(jnp.copy, g_vars['params'])
        if ema_decay > 0 else None,
    )
