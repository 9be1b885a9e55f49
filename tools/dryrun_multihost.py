"""Multi-PROCESS dryrun: the real fused train step across 2 processes.

`__graft_entry__.dryrun_multichip` proves the multi-DEVICE step on a
virtual mesh inside one process; this tool proves the multi-HOST pieces
at runtime, which the unit suite can only check in-process:

  * ``parallel.mesh.init_distributed()`` — the plain env-var launch path
    (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID),
    exactly what a one-python-per-host rollout exports (DEPLOY.md).
  * global-array assembly from per-process slabs:
    ``shard_batch`` -> ``jax.make_array_from_process_local_data``.
  * the fused shard_map step's gradient/stat pmeans riding CROSS-PROCESS
    collectives (Gloo on CPU here; DCN on a real pod) instead of
    single-process XLA all-reduce.

Topology: 2 processes x 4 virtual CPU devices = the same 8-device data
mesh the single-process gate uses, so the cross-check is exact: the
same tiny-config step on the same global batch must produce the same
losses whether the 8 replicas live in one process or two.

Usage (launcher spawns everything):
    python tools/dryrun_multihost.py            # writes MULTIHOST.json

Reference for the parallelism being validated: the reference's only
parallelism is single-process torch DataParallel (main.py:132-135);
multi-host is a capability the TPU build adds (SURVEY.md section 5).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get('T2I_MULTIHOST_PORT', '12931'))
NPROC = 2
DEV_PER_PROC = 4


# Step-level legs: every SPMD lowering the framework ships must produce
# identical losses whether the 8 replicas live in one process or two.
#   shard_map — the default collective-explicit lowering
#   gspmd     — sharding-annotated jit (XLA inserts the collectives)
#   zero1     — shard_map + TPU_SHARDED_ADAM (optimizer moments sharded
#               over the global mesh, the cross-process reduce_scatter/
#               all_gather pair riding DCN on a real pod)
MODES = ('shard_map', 'gspmd', 'zero1')


def _tiny_cfg(mode: str = 'shard_map'):
    from text2img_ekl_tpu.config import cfg_from_file
    cfg = cfg_from_file(os.path.join(
        REPO, 'cfg', 'birds_2stg_splitz_cap_ca.realcls.yml'))
    # same tiny-shape recipe as __graft_entry__.dryrun_multichip: shrink
    # dims, keep the pipeline; f32 so cross-topology losses compare
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TRAIN.BATCH_SIZE = 2  # per device
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_BN_DTYPE = 'float32'
    cfg.TPU_SPMD_MODE = 'gspmd' if mode == 'gspmd' else 'shard_map'
    cfg.TPU_SHARDED_ADAM = mode == 'zero1'
    return cfg


def _run_step(jax, mode: str = 'shard_map'):
    """Build state/batch deterministically and run ONE fused step over
    ALL visible devices (global mesh). Returns {metric: float}."""
    import jax.numpy as jnp
    import numpy as np

    from text2img_ekl_tpu.models import build_discriminators, build_generator
    from text2img_ekl_tpu.parallel import make_mesh, shard_batch
    from text2img_ekl_tpu.train import create_train_state, make_train_step
    from text2img_ekl_tpu.train.state import place_state_on_mesh
    from text2img_ekl_tpu.train.step import (cond_code_width,
                                             make_synthetic_batch)

    cfg = _tiny_cfg(mode)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg), mesh=mesh)
    # place_state_on_mesh itself rendezvouses all processes before its
    # first cross-process collective (the replicated device_put's
    # multihost assert_equal — the Gloo ~30s-deadline race observed on
    # the 4-process leg under full-suite contention lives there, so the
    # fix lives in the product path, covering the trainer's resume
    # placement too)
    state = place_state_on_mesh(cfg, mesh, state)

    # One deterministic GLOBAL batch; each process hands shard_batch only
    # the rows its addressable devices own, in mesh order — the contract
    # of make_array_from_process_local_data (and of the striding loader).
    gbatch = make_synthetic_batch(cfg, cfg.TRAIN.BATCH_SIZE * n_dev)
    if jax.process_count() > 1:
        per = cfg.TRAIN.BATCH_SIZE
        mine = [i for i, d in enumerate(mesh.devices.flat)
                if d.process_index == jax.process_index()]
        rows = np.concatenate([np.arange(i * per, (i + 1) * per)
                               for i in mine])
        gbatch = jax.tree.map(lambda x: np.asarray(x)[rows], gbatch)
    batch = shard_batch(mesh, gbatch)

    step_fn = make_train_step(cfg, G, Ds, mesh)
    if jax.process_count() > 1:
        # Compile-THEN-barrier, the trainer's pattern (train/trainer.py):
        # a partially-warm compile cache (or 1-core CPU contention, as
        # hit once under the full pytest suite) can skew the workers'
        # arrival at the step's first cross-process collective past
        # Gloo's fixed ~30s key-value rendezvous deadline. AOT-compile,
        # rendezvous over gRPC (generous timeout), then execute.
        from text2img_ekl_tpu.parallel.mesh import sync_processes
        compiled = step_fn.lower(state, batch,
                                 jax.random.PRNGKey(1)).compile()
        sync_processes('dryrun_step')
        state, metrics, _ = compiled(state, batch, jax.random.PRNGKey(1))
    else:
        state, metrics, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    out = {k: float(v) for k, v in metrics.items()}
    for k, v in out.items():
        assert np.isfinite(v), (k, v)
    return out


def worker(pid: int, mode: str, port: int, nproc: int = NPROC,
           dpp: int = DEV_PER_PROC) -> None:
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=%d' % dpp
    ).strip()
    # the plain-launcher contract init_distributed() documents:
    os.environ['JAX_COORDINATOR_ADDRESS'] = 'localhost:%d' % port
    os.environ['JAX_NUM_PROCESSES'] = str(nproc)
    os.environ['JAX_PROCESS_ID'] = str(pid)
    sys.path.insert(0, REPO)
    import jax
    jax.config.update('jax_platforms', 'cpu')  # env var is ignored here
    from text2img_ekl_tpu.parallel import init_distributed
    assert init_distributed(), 'coordinator env vars not picked up'
    assert jax.process_count() == nproc and jax.process_index() == pid
    assert len(jax.devices()) == nproc * dpp
    metrics = _run_step(jax, mode)
    print('MULTIHOST_RESULT %s' % json.dumps(
        {'process': pid, 'metrics': metrics}), flush=True)


def single(mode: str, n_dev: int = NPROC * DEV_PER_PROC) -> None:
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=%d' % n_dev).strip()
    sys.path.insert(0, REPO)
    import jax
    jax.config.update('jax_platforms', 'cpu')
    metrics = _run_step(jax, mode)
    print('MULTIHOST_RESULT %s' % json.dumps(
        {'process': 'single', 'metrics': metrics}), flush=True)


def _drain(procs, timeout=900):
    """communicate() every proc, assert rc=0, and on ANY failure —
    timeout, nonzero exit, assertion — kill the survivors. One worker
    dying early (port bound, import error, stuck compile) wedges its
    peer in a distributed barrier holding the coordinator port and the
    only CPU core for the rest of the suite; every spawn site must be
    orphan-safe by construction, so all of them drain through here."""
    outs = []
    try:
        for p in procs:
            outs.append(p.communicate(timeout=timeout)[0])
        for p, out in zip(procs, outs):
            assert p.returncode == 0, 'rc=%s\n%s' % (p.returncode,
                                                     out[-4000:])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return outs


def _isolate_cache(env: dict, tag: str) -> dict:
    """A compilation cache (T2I_JAX_CACHE) SHARED between concurrently
    launched worker processes can skew their arrival at the first
    cross-process collective — partial/asymmetric cache hits let one
    process reach execution while its peer is still compiling, blowing
    Gloo's fixed ~30s key-value timeout (observed once as
    'Gloo context initialization failed: GetKeyValue() timed out').
    Give each worker its own subdirectory: re-runs stay warm per
    worker with zero cross-process cache interaction."""
    if env.get('T2I_JAX_CACHE'):
        env['T2I_JAX_CACHE'] = os.path.join(env['T2I_JAX_CACHE'],
                                            'mh_%s' % tag)
    return env


def _parse_result(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith('MULTIHOST_RESULT '):
            return json.loads(line[len('MULTIHOST_RESULT '):])
    raise RuntimeError('no result line:\n%s' % out)


def launch_leg(mode: str, port: int, nproc: int = NPROC,
               dpp: int = DEV_PER_PROC) -> dict:
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    n_dev = nproc * dpp
    tag_base = '%s_%dx%d' % (mode, nproc, dpp)

    def spawn(args, tag):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + args,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=_isolate_cache(dict(env), '%s_%s' % (tag_base, tag)),
            cwd=REPO)

    workers = [spawn(['--worker', str(pid), '--mode', mode,
                      '--port', str(port), '--nproc', str(nproc),
                      '--dev-per-proc', str(dpp)], str(pid))
               for pid in range(nproc)]
    # one CPU core serializes the workers' cold compiles; scale the
    # drain budget with the process count
    results = [_parse_result(o)
               for o in _drain(workers, timeout=900 * max(1, nproc // 2))]
    sp = _parse_result(
        _drain([spawn(['--single', '--mode', mode,
                       '--ndev', str(n_dev)], 'single')])[0])

    m0, ms = results[0]['metrics'], sp['metrics']
    checks = {}
    for k in ('errG', 'errD'):
        # every process sees the SAME globally-reduced value — with
        # nproc > 2 this exercises the non-pairwise allgather paths
        for r in results[1:]:
            assert abs(m0[k] - r['metrics'][k]) <= \
                1e-6 * max(1.0, abs(m0[k])), (k, m0[k], r)
        # NxD cross-process == 1x(N*D) in-process (reduction-order only)
        rel = abs(m0[k] - ms[k]) / max(1.0, abs(ms[k]))
        assert rel <= 1e-4, (k, m0[k], ms[k], rel)
        checks[k] = {'multi': m0[k], 'single': ms[k], 'rel': rel}

    return {
        'ok': True,
        'mode': mode,
        'topology': '%d processes x %d cpu devices vs 1 x %d'
                    % (nproc, dpp, n_dev),
        'checks': checks,
        'multi_metrics': m0,
        'single_metrics': ms,
    }


def launch() -> dict:
    """All step-level legs -> MULTIHOST.json. Distinct coordinator ports
    per leg: a just-released port can linger in TIME_WAIT."""
    legs = {}
    for i, mode in enumerate(MODES):
        legs[mode] = launch_leg(mode, PORT + 10 * i)
        print('leg %s ok (errG rel %.2e)' % (
            mode, legs[mode]['checks']['errG']['rel']), flush=True)
    # 4 processes x 2 devices: the Gloo rendezvous + consensus code above
    # only ever saw 2 processes; >2 exercises the non-pairwise
    # allgather/consensus paths on the same 8-device global mesh
    legs['shard_map_4proc'] = launch_leg('shard_map', PORT + 10 * len(MODES),
                                         nproc=4, dpp=2)
    print('leg shard_map_4proc ok (errG rel %.2e)' % (
        legs['shard_map_4proc']['checks']['errG']['rel']), flush=True)
    report = {
        # a failing leg raises out of launch_leg (no report is written
        # at all), so a written report is by construction all-ok
        'ok': True,
        'topology': legs[MODES[0]]['topology'],
        'legs': legs,
        # back-compat top-level fields = the default shard_map leg
        'checks': legs['shard_map']['checks'],
        'multi_metrics': legs['shard_map']['multi_metrics'],
        'single_metrics': legs['shard_map']['single_metrics'],
    }
    out_path = os.environ.get('T2I_MULTIHOST_OUT',
                              os.path.join(REPO, 'MULTIHOST.json'))
    with open(out_path, 'w') as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return report


# Tiny flagship-shaped config for the 2-process TRAINER smoke: split-z
# capsule G/D pipeline at GF/DF=8 so CPU compiles stay cheap; IS gate
# pushed out of range (the scorer would compile InceptionV3 per add);
# SNAPSHOT_INTERVAL=1 forces the collective orbax save at epoch 0.
_TRAINER_YML = """\
CONFIG_NAME: 'mh-smoke'
DATASET_NAME: 'birds'
WORKERS: 2
TREE:
    BRANCH_NUM: 2
TRAIN:
    FLAG: True
    BATCH_SIZE: 2
    MAX_EPOCH: 300
    SNAPSHOT_INTERVAL: 1
    G_CAPSULE: True
    D_CAPSULE: True
    CAT_Z: 'concat'
GAN:
    GF_DIM: 8
    DF_DIM: 8
    Z_DIM: 128
    EMBEDDING_DIM: 128
    ENTITY_DIM: 200
    MANIFD_DIM: 128
    R_NUM: 2
    B_CONDITION: True
TPU_SYNTHETIC_DATA: True
TPU_CAPSULE_PALLAS: False
TPU_COMPUTE_DTYPE: 'float32'
TPU_BN_DTYPE: 'float32'
TPU_IS_EVERY: 1000000
"""


def launch_trainer(workdir: str | None = None) -> dict:
    """Full `main.py --synthetic` under 2 processes x 2 CPU devices:
    the REAL CLI path end to end — init_distributed, shared run-dir
    broadcast, striding loader, fused step over the 4-device global
    mesh, process-0-only logging, and the COLLECTIVE orbax snapshot."""
    import shutil
    import tempfile
    cleanup = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix='mh_trainer_')
    cfg_path = os.path.join(workdir, 'mh_smoke.yml')
    with open(cfg_path, 'w') as f:
        f.write(_TRAINER_YML)

    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith(('JAX_', 'XLA_'))}
    procs = []
    for pid in range(NPROC):
        env = _isolate_cache(dict(base_env), 'trainer%d' % pid)
        env['T2I_PLATFORM'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env['JAX_COORDINATOR_ADDRESS'] = 'localhost:%d' % (PORT + 1)
        env['JAX_NUM_PROCESSES'] = str(NPROC)
        env['JAX_PROCESS_ID'] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'main.py'),
             # TPU_IS_EVERY=1000000 in the yml disables the in-training
             # IS stream outright (no InceptionV3 compile on CPU);
             # max_steps=1 keeps the smoke to a single fused step
             '--cfg', cfg_path, '--synthetic', '--max_steps', '1',
             '--manualSeed', '7'],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=workdir))
    outs = _drain(procs, timeout=1500)

    for out in outs:
        assert 'jax.distributed initialized (multi-host)' in out
    # stdout hygiene: the epoch loss line and the snapshot ack are
    # process-0-only (trainer.is_main)
    assert 'Loss_D_all' in outs[0], outs[0][-4000:]
    assert 'Loss_D_all' not in outs[1], outs[1][-4000:]
    assert 'Snapshot: save model ok' in outs[0]
    assert 'Snapshot: save model ok' not in outs[1]

    # both processes agreed on ONE run directory (timestamp broadcast)
    runs = os.listdir(os.path.join(workdir, 'output'))
    assert len(runs) == 1, runs
    # ...and the collective orbax save landed there
    model_dir = os.path.join(workdir, 'output', runs[0], 'Model')
    snaps = [d for d in os.listdir(model_dir)
             if d.startswith('state_epoch')]
    assert snaps, os.listdir(model_dir)
    # the collective save is complete and loadable (orbax writes a
    # commit marker only after every process's shards land)
    import glob
    assert glob.glob(os.path.join(model_dir, snaps[0], '**', '*'),
                     recursive=True)

    report = {'ok': True, 'run_dir': runs[0], 'snapshots': snaps,
              'topology': '2 processes x 2 cpu devices, main.py CLI'}
    if cleanup:
        # self-made tempdir: remove on success (every assertion above
        # passed); kept on failure for debugging, and caller-provided
        # workdirs are never touched
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(report))
    return report


def launch_trainer_signal(workdir: str | None = None) -> dict:
    """SIGTERM-to-ONE-process stop: the wedge scenario.

    A signal landing on a subset of processes must not send that process
    into the (collective) orbax save while its peer runs the next step's
    pmean — the trainer reaches stop consensus through
    parallel.mesh.any_process_flag at a fixed poll cadence
    (STOP_POLL_STEPS). Here: launch the 2-process CLI with a long step
    budget, wait for BOTH workers' 'train: processes aligned' marker
    (compile + barrier done, handler installed), SIGTERM only the
    NON-main worker, and require both processes to checkpoint and exit
    rc=0."""
    import shutil
    import signal as _signal
    import tempfile
    import threading
    cleanup = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix='mh_signal_')
    cfg_path = os.path.join(workdir, 'mh_signal.yml')
    with open(cfg_path, 'w') as f:
        # no epoch-boundary work before the stop: the signal lands
        # within epoch 0 (synthetic epoch is ~128 steps, the poll fires
        # at step 10), and SNAPSHOT_INTERVAL out of range keeps the only
        # save the signal-triggered one
        f.write(_TRAINER_YML.replace('SNAPSHOT_INTERVAL: 1',
                                     'SNAPSHOT_INTERVAL: 100000'))

    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith(('JAX_', 'XLA_'))}
    procs, watchers, aligned = [], [], []
    for pid in range(NPROC):
        env = _isolate_cache(dict(base_env), 'trainer%d' % pid)
        env['T2I_PLATFORM'] = 'cpu'
        env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
        env['JAX_COORDINATOR_ADDRESS'] = 'localhost:%d' % (PORT + 2)
        env['JAX_NUM_PROCESSES'] = str(NPROC)
        env['JAX_PROCESS_ID'] = str(pid)
        p = subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'main.py'),
             # backstop: if the signal machinery fails the run still
             # ends (and the asserts below then fail with the output)
             '--cfg', cfg_path, '--synthetic', '--max_steps', '2000',
             '--manualSeed', '7'],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=workdir)
        ev = threading.Event()
        lines: list = []

        def read(p=p, ev=ev, lines=lines):
            for ln in p.stdout:
                lines.append(ln)
                if 'train: processes aligned' in ln:
                    ev.set()
            ev.set()  # EOF: never leave the waiter hanging

        t = threading.Thread(target=read, daemon=True)
        t.start()
        procs.append(p)
        watchers.append((t, lines))
        aligned.append(ev)

    outs = []
    try:
        for ev in aligned:
            assert ev.wait(timeout=1200), 'worker never aligned'
        assert all(p.poll() is None for p in procs), 'worker died early'
        procs[1].send_signal(_signal.SIGTERM)  # NON-main process only
        for p, (t, lines) in zip(procs, watchers):
            p.wait(timeout=600)
            t.join(timeout=60)
            outs.append(''.join(lines))
        for p, out in zip(procs, outs):
            assert p.returncode == 0, 'rc=%s\n%s' % (p.returncode,
                                                     out[-4000:])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()

    # BOTH processes reached consensus and took the collective save
    for i, out in enumerate(outs):
        assert 'checkpointed on signal; exiting train loop' in out, (
            'worker %d:\n%s' % (i, out[-4000:]))
    # only the signalled worker logged the handler
    assert 'checkpointing at next step boundary' in outs[1]
    assert 'checkpointing at next step boundary' not in outs[0]
    # the signal-triggered snapshot is on disk and complete
    runs = os.listdir(os.path.join(workdir, 'output'))
    assert len(runs) == 1, runs
    model_dir = os.path.join(workdir, 'output', runs[0], 'Model')
    snaps = [d for d in os.listdir(model_dir)
             if d.startswith('state_epoch')]
    assert snaps, os.listdir(model_dir)

    report = {'ok': True, 'snapshots': snaps,
              'topology': 'SIGTERM to process 1 of 2, consensus stop'}
    if cleanup:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(report))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--single', action='store_true')
    ap.add_argument('--mode', choices=MODES, default='shard_map')
    ap.add_argument('--port', type=int, default=PORT)
    ap.add_argument('--nproc', type=int, default=NPROC)
    ap.add_argument('--dev-per-proc', type=int, default=DEV_PER_PROC)
    ap.add_argument('--ndev', type=int, default=NPROC * DEV_PER_PROC)
    ap.add_argument('--trainer', action='store_true',
                    help='2-process main.py CLI smoke instead of the '
                         'step-level cross-check')
    ap.add_argument('--trainer-signal', action='store_true',
                    help='2-process CLI + SIGTERM to one process: '
                         'consensus checkpoint-and-stop')
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.mode, args.port, args.nproc,
               args.dev_per_proc)
    elif args.single:
        single(args.mode, args.ndev)
    elif args.trainer:
        launch_trainer()
    elif args.trainer_signal:
        launch_trainer_signal()
    else:
        launch()


if __name__ == '__main__':
    main()
