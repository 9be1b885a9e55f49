"""Real multi-PROCESS validation of the multi-host path.

Everything else in the suite runs multi-device inside ONE process; this
spawns tools/dryrun_multihost.py, which launches 2 actual processes
(x4 virtual CPU devices each) plus a single-process 8-device reference,
and asserts the fused train step produces the same losses either way.

Runtime pieces this covers that in-process tests cannot:
  * parallel.mesh.init_distributed() picking up the plain-launcher env
    contract (JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID)
  * jax.make_array_from_process_local_data assembly in shard_batch
  * the step's pmeans riding cross-process (Gloo) collectives

The reference has no multi-process mode at all (torch DataParallel only,
/root/reference/main.py:132-135).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_step_matches_single_process(tmp_path):
    out = tmp_path / 'MULTIHOST.json'
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    env['T2I_MULTIHOST_OUT'] = str(out)
    env['T2I_MULTIHOST_PORT'] = '12973'  # keep clear of manual runs
    # New session + killpg on timeout: a plain subprocess timeout would
    # kill only the launcher, orphaning its worker grandchildren on the
    # coordinator port and the host's only CPU core for the rest of the
    # suite. Budget: 3 legs x (2 workers + 1 single) + the 4-process
    # leg (its own drain budget is 1800s), worst-case cold compiles
    # serialized on 1 core — the outer timeout must exceed the sum of
    # ALL inner drain budgets: 3x900 worker drains + 1800 (4-proc) +
    # 4x900 single-reference drains = 8100s.
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, 'tools', 'dryrun_multihost.py')],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO, start_new_session=True)
    try:
        stdout, _ = proc.communicate(timeout=9000)
    except subprocess.TimeoutExpired:
        import signal
        os.killpg(proc.pid, signal.SIGKILL)
        stdout, _ = proc.communicate()
        raise AssertionError('dryrun timed out:\n%s' % stdout[-4000:])
    assert proc.returncode == 0, stdout
    report = json.loads(out.read_text())
    assert report['ok']
    # one leg per SPMD lowering — shard_map, gspmd (sharding-annotated
    # jit), ZeRO-1 (TPU_SHARDED_ADAM over the global mesh) — plus the
    # 4-process x 2-device topology leg (non-pairwise rendezvous paths)
    assert set(report['legs']) == {'shard_map', 'gspmd', 'zero1',
                                   'shard_map_4proc'}
    for leg in report['legs'].values():
        for k in ('errG', 'errD'):
            assert leg['checks'][k]['rel'] <= 1e-4, (leg['mode'], k)


def test_two_process_main_cli_smoke(tmp_path):
    """Full `main.py --synthetic` under 2 processes x 2 CPU devices —
    the CLI multi-host path end to end: init_distributed, the
    broadcast-shared run directory (wall clocks drift across hosts and
    orbax saves are collective), the striding loader, the fused step
    over the 4-device global mesh, process-0-only stdout, and the
    collective epoch-0 snapshot."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'dryrun_multihost.py'),
         '--trainer'],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{')][-1]
    report = json.loads(line)
    assert report['ok'] and report['snapshots']


def test_two_process_signal_stop_consensus(tmp_path):
    """SIGTERM delivered to only ONE process (the non-main worker) must
    checkpoint-and-stop BOTH: the signal-triggered orbax save is a
    collective, so without the trainer's any_process_flag consensus the
    signalled process would enter the save while its peer runs the next
    step's pmean and the job would wedge on mismatched collectives."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(('JAX_', 'XLA_'))}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'dryrun_multihost.py'),
         '--trainer-signal'],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{')][-1]
    report = json.loads(line)
    assert report['ok'] and report['snapshots']


def test_coordinator_address_alias_passed_through(monkeypatch):
    """jax reads only JAX_COORDINATOR_ADDRESS from the environment; the
    bare COORDINATOR_ADDRESS alias the docs advertise must be handed to
    initialize() explicitly or the gate would fire and the call fail."""
    import jax
    from text2img_ekl_tpu.parallel.mesh import init_distributed

    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None, **kw):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id)

    monkeypatch.setattr(jax.distributed, 'initialize', fake_initialize)
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    monkeypatch.setenv('COORDINATOR_ADDRESS', 'host0:1234')
    monkeypatch.setenv('JAX_NUM_PROCESSES', '2')
    monkeypatch.setenv('JAX_PROCESS_ID', '1')
    assert init_distributed()
    assert calls == {'addr': 'host0:1234', 'n': 2, 'pid': 1}

    # with the native var set, jax's own env handling wins (addr=None)
    calls.clear()
    monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', 'host0:1234')
    assert init_distributed()
    assert calls['addr'] is None


def test_eval_sample_target_splits_across_processes():
    """The offline protocol's counter is process-local while the test
    loader strides items across processes: the per-process budget must be
    ceil(SAMPLE_NUM / P) so P hosts land the global PNG count on
    TEST.SAMPLE_NUM (a local target of SAMPLE_NUM would emit P x 30k)."""
    from text2img_ekl_tpu.train.trainer import _local_sample_target

    assert _local_sample_target(30000, 1) == 30000
    assert _local_sample_target(30000, 4) == 7500
    assert _local_sample_target(30001, 4) == 7501  # ceil, never under
    assert _local_sample_target(50, 0) == 50      # defensive clamp
