#!/usr/bin/env python
"""Long-horizon training soak on the real chip, with mid-run SIGTERM +
resume and a same-seed BatchNorm-dtype A/B — the operational evidence the
reference's 600-epoch empirical runs provide implicitly
(cub_trainer_splitz_cap_ca.py:493-696) and step-level parity tests cannot.

Three phases, one artifact (SOAK JSON):

  1. MAIN leg: flagship config, synthetic data, shipped defaults, to an
     absolute step target. The driver SIGTERMs the worker mid-run (the
     trainer checkpoints at the next step boundary), then relaunches into
     the same output dir — CheckpointManager.latest() auto-resume — and
     the run continues to the same global target (trainer target_step).
  2. BN A/B: two uninterrupted same-seed arms (TPU_BN_DTYPE float32 vs
     bfloat16), identical init (PRNGKey(0)), data (synthetic, fixed
     seeds) and step keys (host-built from the step counter), so the
     loss-band and relative-IS comparison isolates the BN IO dtype.
  3. Analysis over the metrics.jsonl streams: finiteness of every logged
     scalar, loss trajectory bands, steps/sec (and first-vs-second-half
     drift), IS stream, resume continuity across the kill boundary, HBM
     use at leg start/end.

Run (expects the real TPU; ~30-60 min at the defaults):

  python tools/soak.py --steps 2000 --kill-at 700 --ab-steps 1000 \\
      --out SOAK_r05.json

The driver carries the wedge watchdog the tunneled backend needs
(PERF.md; a worker that logs nothing for minutes with flat CPU is dead,
not slow): a stalled worker is killed by PID and relaunched, and the
auto-resume path makes the relaunch safe and cheap.
"""
import argparse
import json
import math
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEY_METRICS = ('errD', 'errG', 'errD_match', 'errD_uncond', 'errD_cls',
               'errG_match', 'errG_uncond', 'errG_cls', 'kl_sen', 'kl_cls',
               'mu_sen_mean', 'std_sen_mean', 'mu_cls_mean', 'std_cls_mean')


# ---------------------------------------------------------------- worker
def worker_main(args):
    os.environ.setdefault('T2I_JAX_CACHE',
                          os.path.join(REPO, '.jax_cache_tpu'))
    from text2img_ekl_tpu.config import cfg_from_file
    cfg = cfg_from_file(args.cfg)
    cfg.TPU_SYNTHETIC_DATA = True
    if args.bn_dtype:
        cfg.TPU_BN_DTYPE = args.bn_dtype

    import jax
    if os.environ.get('T2I_PLATFORM'):
        # sitecustomize force-registers the TPU plugin; jax.config is the
        # working switch (PERF.md) — lets the soak smoke run on CPU
        jax.config.update('jax_platforms', os.environ['T2I_PLATFORM'])

    def memstats():
        try:
            m = jax.local_devices()[0].memory_stats() or {}
            return {k: v for k, v in m.items()
                    if isinstance(v, (int, float))}
        except Exception:
            return {}

    from text2img_ekl_tpu.train.trainer import CondGANTrainer
    algo = CondGANTrainer(cfg, args.outdir)
    # the config's epoch budget caps total steps (reference semantics:
    # MAX_EPOCH bounds the loop); a soak horizon past it must raise the
    # cap or train() returns early at MAX_EPOCH * steps_per_epoch
    need_epochs = -(-args.target_step // max(1, algo.num_batches)) + 1
    if cfg.TRAIN.MAX_EPOCH < need_epochs:
        print('SOAK: raising MAX_EPOCH %d -> %d to fit target_step %d'
              % (cfg.TRAIN.MAX_EPOCH, need_epochs, args.target_step),
              flush=True)
        cfg.TRAIN.MAX_EPOCH = need_epochs
    print('SOAK_MEM_START ' + json.dumps(memstats()), flush=True)
    t0 = time.time()
    algo.train(target_step=args.target_step)
    print('SOAK_MEM_END ' + json.dumps(memstats()), flush=True)
    print('SOAK_WALL %.1f' % (time.time() - t0), flush=True)


# ---------------------------------------------------------------- driver
def _read_jsonl(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    out.append(json.loads(line))
                except ValueError:
                    pass  # torn final line during a concurrent write
    return out


def _last_step(path):
    recs = _read_jsonl(path)
    return recs[-1]['step'] if recs else 0


def run_leg(name, outdir, cfg, target_step, kill_at=None, bn_dtype=None,
            first_record_grace=2400, stall_s=600, max_relaunches=3):
    """Run one worker leg to target_step; returns the leg record dict.

    kill_at: SIGTERM the worker once metrics.jsonl reaches this step —
    exactly once across relaunches (the kill is the TEST; the relaunch
    path after it is the auto-resume under test).
    """
    os.makedirs(outdir, exist_ok=True)
    jsonl = os.path.join(outdir, 'Log', 'metrics.jsonl')
    leg = {'name': name, 'target_step': target_step, 'kill_at': kill_at,
           'bn_dtype': bn_dtype, 'launches': [], 'killed_at_step': None,
           'stalls': 0}
    killed = False
    for attempt in range(max_relaunches + 1):
        log_path = os.path.join(outdir, 'worker_%s_%d.log' % (name, attempt))
        cmd = [sys.executable, os.path.abspath(__file__), '--worker',
               '--cfg', cfg, '--outdir', outdir,
               '--target-step', str(target_step)]
        if bn_dtype:
            cmd += ['--bn-dtype', bn_dtype]
        t_start = time.time()
        with open(log_path, 'w') as lf:
            proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT,
                                    cwd=REPO)
        print('[soak] %s attempt %d: pid %d -> %s'
              % (name, attempt, proc.pid, log_path), flush=True)
        base_step = _last_step(jsonl)
        last_progress, last_new = base_step, time.time()
        stalled = False
        while True:
            time.sleep(15)
            rc = proc.poll()
            step_now = _last_step(jsonl)
            if step_now > last_progress:
                last_progress, last_new = step_now, time.time()
            if rc is not None:
                break
            if kill_at and not killed and step_now >= kill_at:
                print('[soak] %s: SIGTERM at logged step %d'
                      % (name, step_now), flush=True)
                proc.send_signal(signal.SIGTERM)
                killed = True
                leg['killed_at_step'] = step_now
                # the checkpoint-and-exit takes one boundary + orbax write
                continue
            grace = (first_record_grace if last_progress == base_step
                     else stall_s)
            if time.time() - last_new > grace:
                print('[soak] %s: no progress in %ds (wedge) — killing pid '
                      '%d' % (name, grace, proc.pid), flush=True)
                proc.kill()
                proc.wait()
                stalled = True
                leg['stalls'] += 1
                break
        leg['launches'].append({
            'attempt': attempt, 'rc': proc.returncode,
            'wall_s': round(time.time() - t_start, 1),
            'from_step': base_step, 'to_step': _last_step(jsonl),
            'stalled': stalled, 'log': os.path.basename(log_path)})
        if (proc.returncode not in (0, None) and not stalled
                and _last_step(jsonl) == base_step):
            # deterministic crash before any progress — relaunching
            # would loop on the same failure; surface it instead
            print('[soak] %s: worker crashed (rc=%s) with no progress — '
                  'aborting leg, see %s'
                  % (name, proc.returncode, log_path), flush=True)
            leg['aborted'] = True
            break
        if (not stalled and proc.returncode == 0
                and _last_step(jsonl) >= target_step - 100):
            break  # reached the horizon
        if killed and kill_at:
            kill_at = None  # the one planned kill happened
        # otherwise relaunch: auto-resume continues toward the target —
        # the post-kill leg, a wedge kill, AND a clean-but-short exit
        # (e.g. an externally-signalled checkpoint-and-exit-0) all
        # resume from the last checkpoint rather than count as done
    return leg


# -------------------------------------------------------------- analysis
def _finite(x):
    return isinstance(x, (int, float)) and math.isfinite(x)


def _stats(vals):
    if not vals:
        return None
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / max(1, n - 1)
    return {'n': n, 'first': vals[0], 'last': vals[-1],
            'mean': round(mean, 5), 'std': round(math.sqrt(var), 5),
            'min': min(vals), 'max': max(vals)}


def summarize_run(recs):
    """Trajectory summary over a metrics.jsonl record list."""
    loss_recs = [r for r in recs if 'errG' in r]
    out = {'records': len(recs), 'loss_records': len(loss_recs),
           'first_step': recs[0]['step'] if recs else None,
           'last_step': recs[-1]['step'] if recs else None}
    bad = []
    for r in recs:
        for k, v in r.items():
            if k != 'time' and not _finite(v):
                bad.append({'step': r.get('step'), 'key': k, 'val': str(v)})
    out['non_finite'] = bad[:20]
    out['all_finite'] = not bad
    metrics = {}
    half = len(loss_recs) // 2
    for k in KEY_METRICS:
        vals = [r[k] for r in loss_recs if k in r]
        if vals:
            metrics[k] = {'overall': _stats(vals),
                          'first_half': _stats(vals[:half]),
                          'second_half': _stats(vals[half:])}
    out['metrics'] = metrics
    # steps/sec from adjacent 100-step records (skip leg boundaries,
    # where the wall gap includes relaunch + compile)
    rates = []
    for a, b in zip(loss_recs, loss_recs[1:]):
        ds, dt = b['step'] - a['step'], b['time'] - a['time']
        if ds == 100 and 0 < dt < 600:
            rates.append(ds / dt)
    rates_sorted = sorted(rates)
    if rates:
        mid = len(rates) // 2
        out['steps_per_sec'] = {
            'n_intervals': len(rates),
            'median': round(rates_sorted[len(rates) // 2], 3),
            'p10': round(rates_sorted[int(len(rates) * .1)], 3),
            'p90': round(rates_sorted[int(len(rates) * .9)], 3),
            'first_half_median': round(
                sorted(rates[:mid])[mid // 2], 3) if mid else None,
            'second_half_median': round(
                sorted(rates[mid:])[(len(rates) - mid) // 2], 3),
        }
    out['is_stream'] = [
        {'step': r['step'], 'is': round(r['inception_score'], 4)}
        for r in recs if 'inception_score' in r]
    return out


def resume_report(recs, killed_at):
    """Continuity across the SIGTERM boundary: the resumed leg must pick
    up at the checkpointed counter (no step reset, no re-zeroed loss
    regime) and the loss band must carry across."""
    if killed_at is None:
        return {'ok': False, 'reason': 'no kill happened'}
    loss = [r for r in recs if 'errG' in r]
    pre = [r for r in loss if r['step'] <= killed_at]
    post = [r for r in loss if r['step'] > killed_at]
    if not pre or not post:
        return {'ok': False, 'reason': 'missing pre/post records'}
    gap = post[0]['step'] - pre[-1]['step']
    k = min(5, len(pre), len(post))
    band = {}
    ok = 0 < gap <= 300  # one checkpoint boundary + <=2 log periods
    for key in ('errD', 'errG', 'std_sen_mean'):
        pv = [r[key] for r in pre[-k:] if key in r]
        qv = [r[key] for r in post[:k] if key in r]
        if pv and qv:
            pm, qm = sum(pv) / len(pv), sum(qv) / len(qv)
            spread = max(1e-3, max(pv + qv) - min(pv + qv))
            band[key] = {'pre_mean': round(pm, 4), 'post_mean': round(qm, 4),
                         'jump_over_spread': round(abs(qm - pm) / spread, 3)}
    steps_monotone = all(b['step'] > a['step']
                         for a, b in zip(loss, loss[1:]))
    return {'ok': bool(ok and steps_monotone), 'killed_at_step': killed_at,
            'boundary_gap_steps': gap, 'steps_monotone': steps_monotone,
            'band_across_boundary': band}


def ab_report(recs_a, recs_b, label_a, label_b):
    """Same-seed arm comparison over the shared step range."""
    la = [r for r in recs_a if 'errG' in r]
    lb = [r for r in recs_b if 'errG' in r]
    out = {'arms': {label_a: len(la), label_b: len(lb)}, 'metrics': {}}
    half = min(len(la), len(lb)) // 2
    for k in KEY_METRICS:
        va = [r[k] for r in la if k in r][half:]
        vb = [r[k] for r in lb if k in r][half:]
        if va and vb:
            ma, mb = sum(va) / len(va), sum(vb) / len(vb)
            sa = _stats(va)['std']
            out['metrics'][k] = {
                label_a: {'mean': round(ma, 4), 'std': round(sa, 4)},
                label_b: {'mean': round(mb, 4),
                          'std': round(_stats(vb)['std'], 4)},
                'mean_diff_in_stds': round(abs(ma - mb) / max(sa, 1e-4), 3)}
    isa = {r['step']: r['inception_score'] for r in recs_a
           if 'inception_score' in r}
    isb = {r['step']: r['inception_score'] for r in recs_b
           if 'inception_score' in r}
    curve = []
    for s in sorted(set(isa) | set(isb)):
        # None (valid JSON), never NaN, for a step only one arm logged
        curve.append({'step': s,
                      label_a: round(isa[s], 4) if s in isa else None,
                      label_b: round(isb[s], 4) if s in isb else None})
    out['is_curves'] = curve
    both = [(isa[s], isb[s]) for s in set(isa) & set(isb)]
    if both:
        out['is_rel_diff_mean'] = round(
            sum(abs(a - b) / max(abs(a), 1e-6) for a, b in both)
            / len(both), 4)
    return out


def _grep(path_glob_dir, needle):
    import glob as g
    hits = []
    for p in sorted(g.glob(path_glob_dir)):
        with open(p, errors='replace') as f:
            hits += [ln.strip() for ln in f if needle in ln]
    return hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--worker', action='store_true')
    ap.add_argument('--cfg',
                    default='cfg/birds_2stg_splitz_cap_ca.realcls.yml')
    ap.add_argument('--outdir', default='')
    ap.add_argument('--target-step', type=int, default=2000)
    ap.add_argument('--bn-dtype', default='')
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--kill-at', type=int, default=700,
                    help='SIGTERM the worker at this logged step; 0 '
                         'disables the kill (continuation runs)')
    ap.add_argument('--killed-at-hint', type=int, default=0,
                    help='kill boundary a previous invocation recorded '
                         'in the same workdir (for the resume analysis '
                         'of a --kill-at 0 continuation)')
    ap.add_argument('--ab-steps', type=int, default=1000)
    ap.add_argument('--workdir', default='output/soak_r05')
    ap.add_argument('--out', default='SOAK_r05.json')
    ap.add_argument('--skip-ab', action='store_true')
    args = ap.parse_args()

    if args.worker:
        worker_main(args)
        return

    t0 = time.time()
    art = {'cfg': args.cfg, 'steps': args.steps, 'kill_at': args.kill_at,
           'ab_steps': args.ab_steps,
           'started': time.strftime('%Y-%m-%dT%H:%M:%S')}
    try:
        art['commit'] = subprocess.check_output(
            ['git', 'rev-parse', '--short', 'HEAD'], cwd=REPO,
            text=True).strip()
    except Exception:
        pass

    d_main = os.path.join(REPO, args.workdir, 'main')
    leg = run_leg('main', d_main, args.cfg, args.steps,
                  kill_at=args.kill_at or None)
    recs = _read_jsonl(os.path.join(d_main, 'Log', 'metrics.jsonl'))
    # a continuation run (--kill-at 0 into an existing workdir) can point
    # at the kill boundary a PREVIOUS invocation recorded in the same
    # metrics stream via --killed-at-hint
    killed_at = leg['killed_at_step'] or (args.killed_at_hint or None)
    art['main'] = {'leg': leg, 'summary': summarize_run(recs),
                   'resume': resume_report(recs, killed_at),
                   'resume_log_lines': _grep(
                       os.path.join(d_main, 'worker_*.log'), 'Resumed from'),
                   'mem': {'start': _grep(os.path.join(
                       d_main, 'worker_*.log'), 'SOAK_MEM_START'),
                       'end': _grep(os.path.join(
                           d_main, 'worker_*.log'), 'SOAK_MEM_END')}}

    if not args.skip_ab:
        arms = {}
        for dtype in ('float32', 'bfloat16'):
            d = os.path.join(REPO, args.workdir, 'bn_%s' % dtype)
            arms[dtype] = {
                'leg': run_leg('bn_%s' % dtype, d, args.cfg, args.ab_steps,
                               bn_dtype=dtype),
                'recs': _read_jsonl(os.path.join(d, 'Log', 'metrics.jsonl'))}
        art['bn_ab'] = {
            'f32_summary': summarize_run(arms['float32']['recs']),
            'bf16_summary': summarize_run(arms['bfloat16']['recs']),
            'compare': ab_report(arms['float32']['recs'],
                                 arms['bfloat16']['recs'], 'f32', 'bf16'),
            'legs': {k: v['leg'] for k, v in arms.items()}}

    m = art['main']
    # the resume check binds whenever a kill was REQUESTED (or hinted
    # from a prior invocation) — a requested kill that never fired
    # (target below kill_at, or the worker finishing between polls)
    # must fail the artifact, not silently skip the kill/resume test
    resume_ok = (m['resume'].get('ok')
                 if (args.kill_at or args.killed_at_hint) else True)
    art['ok'] = bool(
        m['summary'].get('all_finite')
        and (m['summary'].get('last_step') or 0) >= args.steps - 100
        and resume_ok)
    if not args.skip_ab:
        f32s = art['bn_ab']['f32_summary']
        bf16s = art['bn_ab']['bf16_summary']
        art['ok'] = art['ok'] and bool(
            f32s.get('all_finite') and bf16s.get('all_finite')
            and (f32s.get('last_step') or 0) >= args.ab_steps - 100
            and (bf16s.get('last_step') or 0) >= args.ab_steps - 100)
    art['total_wall_s'] = round(time.time() - t0, 1)
    with open(os.path.join(REPO, args.out), 'w') as f:
        json.dump(art, f, indent=1)
    print('[soak] wrote %s ok=%s wall=%.0fs'
          % (args.out, art['ok'], art['total_wall_s']), flush=True)


if __name__ == '__main__':
    main()
