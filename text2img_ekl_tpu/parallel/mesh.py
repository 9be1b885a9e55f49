"""Device mesh and sharding policy.

The reference's only parallelism is single-process torch DataParallel
(trainer.py:113,140; main.py:132-135) — replicate the nets, scatter the
batch, gather outputs. The TPU-native equivalent is one
``jax.sharding.Mesh`` with a ``data`` axis: parameters replicated, batch
sharded over the axis, gradient all-reduce as an XLA ``psum`` riding ICI
(multi-host spans DCN over the same axis via jax.distributed).

The train step runs under ``shard_map`` so BatchNorm statistics stay
per-replica — faithful to DataParallel's per-GPU statistics — and the only
collectives are the gradient/statistics pmeans.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def init_distributed() -> bool:
    """Initialize jax.distributed for multi-host (DCN) runs when the
    standard coordinator env vars are present; no-op otherwise.

    The data axis then spans all hosts' devices: per-host batch shards ride
    ICI within a slice and DCN across slices, with no trainer changes.

    On managed clusters (Slurm/MPI/Cloud-TPU) jax auto-detects process
    count/id, so ``JAX_COORDINATOR_ADDRESS`` alone is enough. A plain
    launcher (one python per host, no scheduler) has nothing to
    auto-detect — there it must also export ``JAX_NUM_PROCESSES`` and
    ``JAX_PROCESS_ID``, which are passed through explicitly here
    (exercised for real by tools/dryrun_multihost.py).
    """
    import os
    if os.environ.get('JAX_COORDINATOR_ADDRESS') or \
            os.environ.get('COORDINATOR_ADDRESS'):
        nproc = os.environ.get('JAX_NUM_PROCESSES')
        pid = os.environ.get('JAX_PROCESS_ID')
        # jax reads only JAX_COORDINATOR_ADDRESS from the environment
        # itself; the bare COORDINATOR_ADDRESS alias must be passed through
        # explicitly or the gate would fire and initialize() would fail.
        addr = (None if os.environ.get('JAX_COORDINATOR_ADDRESS')
                else os.environ.get('COORDINATOR_ADDRESS'))
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None)
        return True
    return False


def sync_processes(tag: str, timeout_ms: int = 600_000) -> None:
    """Rendezvous all processes at a coordination-service barrier
    (gRPC, generous timeout) — a no-op single-process.

    Call this immediately before a phase's FIRST cross-process
    collective execution: XLA:CPU creates a fresh Gloo context per
    communicator with a fixed ~30s key-value rendezvous deadline, and
    per-process skew accumulated in Python-side setup (process 0 builds
    the logger/dirs; compile vs compilation-cache-load times differ)
    can exceed it — observed as 'Gloo context initialization failed:
    GetKeyValue() timed out' in the 2-process CLI smoke once a warm
    T2I_JAX_CACHE removed the (symmetric) compile time that used to
    mask the skew. On TPU the barrier is equally harmless and aligns
    the first NCCL-free ICI/DCN launch."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist
    client = getattr(_dist.global_state, 'client', None)
    if client is not None:
        client.wait_at_barrier('t2i_%s' % tag, timeout_in_ms=timeout_ms)


def any_process_flag(flag: bool) -> bool:
    """max-reduce a host-side boolean over processes.

    COLLECTIVE on multi-process runs — every process must call it at the
    same program point (the trainer polls it at a fixed step cadence).
    Used to reach stop consensus before the signal-triggered checkpoint:
    orbax saves are collective, so one process entering a save on its
    local SIGTERM while peers proceed into the next step's pmean wedges
    the job on mismatched collectives."""
    if jax.process_count() <= 1:
        return bool(flag)
    import numpy as np
    from jax.experimental import multihost_utils
    vals = multihost_utils.process_allgather(np.asarray(flag, np.int32))
    return bool(np.max(vals))


def make_mesh(num_devices: int = 0,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """A 1-D data-parallel mesh over the given (or all local) devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded on dim 0.

    On a single-device mesh the arrays are placed WITHOUT committing them to
    a NamedSharding: sharding-committed inputs force the SPMD compile path,
    which this TPU's AOT backend executes ~100x slower than the identical
    unsharded program (measured: 34 ms vs 3.6 s per flagship train step).

    Multi-host: ``batch`` is this process's PER-HOST slice (the loader
    strides the epoch over processes); the global jax.Array is assembled
    from every host's local shards without any cross-host copy.
    """
    if mesh.devices.size == 1:
        # Even device-committed (non-sharded) inputs select the slow
        # executable on this backend; keep arrays uncommitted.
        import jax.numpy as jnp
        return jax.tree.map(jnp.asarray, batch)
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
