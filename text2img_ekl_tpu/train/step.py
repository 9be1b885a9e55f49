"""The fused G+D training step.

The reference spends a step as: G forward, per-stage D forward x3 + backward
+ Adam, then G loss through the *updated* Ds + backward + Adam
(cub_trainer_splitz_cap_ca.py:544-625), with DataParallel scatter/gather
around every forward and Python between every phase.

Here the whole step — G forward, both D updates, G update — is ONE compiled
function under ``shard_map`` over the data mesh axis:

  * the generator forward runs exactly once; its VJP is captured with
    ``jax.vjp`` so the G update pulls gradients back through the saved
    linearization instead of re-running the forward (the reference's
    autograd graph reuse, minus the framework overhead);
  * discriminators see stop_gradient'ed fakes and detached condition codes,
    exactly as the reference detaches (cub_trainer_splitz_cap_ca.py:418-420);
  * the G loss runs the updated D params, matching the reference's
    D-before-G ordering;
  * BatchNorm uses per-replica batch statistics (DataParallel semantics) and
    running averages are pmean'd across the mesh at the end of the step;
  * gradient all-reduce is a single pmean per network, riding ICI.

Two trainer personalities are config-driven strategies, not two files
(SURVEY.md section 7.7): the split-z CA strategy (CUB/flowers,
cub_trainer_splitz_cap_ca.py) and the single-cond strategy (COCO,
trainer.py).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.generator import CondGNet, GNet
from ..parallel.mesh import DATA_AXIS
from .losses import bce, ce_loss, color_consistency_loss, kl_loss
from .state import TrainState, make_optimizer


def fuse_mu(mu1, mu2, cat_z: str):
    """Condition code for D: cat/product/sum of the two mus
    (cub_trainer_splitz_cap_ca.py:577-582)."""
    if cat_z == 'concat':
        return jnp.concatenate([mu1, mu2], axis=1)
    if cat_z == 'product':
        return mu1 * mu2
    if cat_z == 'sum':
        return mu1 + mu2
    raise ValueError(cat_z)


def cond_code_width(cfg) -> int:
    """Actual width of the D condition code for a config."""
    if cfg.DATASET_NAME == 'coco':
        return cfg.GAN.MANIFD_DIM
    if cfg.TRAIN.CAT_Z == 'concat':
        return cfg.GAN.EMBEDDING_DIM + cfg.GAN.MANIFD_DIM
    return cfg.GAN.EMBEDDING_DIM


def make_train_step(cfg, G, Ds, mesh: Mesh = None):
    """Build the fused, jitted train step.

    Returns ``step_fn(state, batch, rng) -> (new_state, metrics, fakes)``
    where ``fakes`` is the top-stage generated batch (device-resident, for
    the in-training IS stream — the reference scores the step's own fakes,
    cub_trainer_splitz_cap_ca.py:613-623, so no extra G forward is paid).
    ``batch`` is a dict with keys:
      real:   tuple of [B, s, s, 3] per branch (in [-1, 1])
      wrong:  tuple of [B, s, s, 3] per branch
      txt:    [B, TEXT.DIMENSION]           (split-z strategies)
      cls_onehot: [B, ENTITY_DIM]           (split-z strategies)
      cond:   [B, cond_dim]                 (single-cond strategy)
      real_cp: [B, ENTITY_DIM + 1]          class targets (one-hot or soft)
    """
    num_ds = len(Ds)
    # On a single-device mesh the pmeans are identities and shard_map only
    # adds overhead (measured 100x+ slower through the TPU AOT path than the
    # identical program under plain jit) — compile the local step directly.
    if mesh is not None and mesh.devices.size == 1:
        mesh = None
    spmd_mode = getattr(cfg, 'TPU_SPMD_MODE', 'shard_map')
    if spmd_mode not in ('shard_map', 'gspmd'):
        raise ValueError('TPU_SPMD_MODE must be shard_map|gspmd, got %r'
                         % spmd_mode)
    gspmd = mesh is not None and spmd_mode == 'gspmd'
    coll_mesh = None if gspmd else mesh  # gspmd: XLA inserts collectives
    uncond_coeff = float(cfg.TRAIN.COEFF.UNCOND_LOSS)
    kl_coeff = float(cfg.TRAIN.COEFF.KL)
    color_coeff = float(cfg.TRAIN.COEFF.COLOR_LOSS)
    ema_decay = float(getattr(cfg, 'TPU_EMA_DECAY', 0.0))
    cat_z = cfg.TRAIN.CAT_Z
    z_dim = cfg.GAN.Z_DIM
    entity_p1 = cfg.GAN.ENTITY_DIM + 1
    g_tx = make_optimizer(cfg.TRAIN.GENERATOR_LR)
    d_tx = make_optimizer(cfg.TRAIN.DISCRIMINATOR_LR)
    single_cond = isinstance(G, CondGNet)
    grouped_d = bool(getattr(cfg, 'TPU_GROUPED_D', False))
    remat_g = str(getattr(cfg, 'TPU_REMAT_G', '') or '')
    if remat_g not in ('', 'full', 'conv'):
        raise ValueError("TPU_REMAT_G must be ''|full|conv, got %r" % remat_g)
    from .state import zero1_shard_count
    n_shards = zero1_shard_count(cfg, mesh)  # >1 => ZeRO-1 weight update
    accum = max(1, int(getattr(cfg, 'TPU_GRAD_ACCUM', 0) or 0))
    if accum > 1 and not remat_g:
        # The k microbatches are UNROLLED into one XLA program, and every
        # microbatch's phase-1 VJP residuals stay live until its phase-3
        # G-backward use — so without rematerialization peak activation
        # memory equals the full-batch run (and compile time scales
        # ~linearly with k). Memory-motivated accumulation must pair with
        # remat; numerics-rehearsal use ((mesh n, accum k) == mesh n*k)
        # is fine either way.
        print('!! TPU_GRAD_ACCUM=%d without TPU_REMAT_G: peak activation '
              'memory still matches the full batch (all microbatch '
              'residuals stay live); set TPU_REMAT_G=conv|full if the '
              'goal is fitting a bigger effective batch' % accum)

    def opt_update(tx, grads, opt_state, params):
        """Replicated: pmean grads, full Adam everywhere. Sharded
        (TPU_SHARDED_ADAM, arXiv:2004.13336): reduce_scatter the flat
        gradient, run Adam on the local 1/N shard of the moments,
        all_gather the update deltas — same math, 1/N optimizer HBM
        traffic and state per device, collectives ride ICI."""
        if n_shards <= 1:
            grads = pmean(grads)
            return tx.update(grads, opt_state, params)
        from jax.flatten_util import ravel_pytree
        flat, unravel = ravel_pytree(grads)
        pad = (-flat.size) % n_shards
        flatp = jnp.pad(flat, (0, pad))
        gshard = jax.lax.psum_scatter(
            flatp, DATA_AXIS, scatter_dimension=0, tiled=True) / n_shards
        # The matching flat params shard: plain adam ignores it (XLA DCEs
        # the ravel+slice), but a params-dependent transform (e.g. adamw
        # weight decay) would otherwise silently compute wrong updates on
        # this path while the replicated path stays right.
        pflat, _ = ravel_pytree(params)
        pshard = jax.lax.dynamic_slice_in_dim(
            jnp.pad(pflat, (0, pad)),
            jax.lax.axis_index(DATA_AXIS) * (flatp.size // n_shards),
            flatp.size // n_shards)
        ushard, new_opt = tx.update(gshard, opt_state, pshard)
        ufull = jax.lax.all_gather(ushard, DATA_AXIS, axis=0, tiled=True)
        return unravel(ufull[:flat.size]), new_opt

    def pmean(x):
        if coll_mesh is None:
            return x
        return jax.lax.pmean(x, DATA_AXIS)

    def local_step(state: TrainState, batch: Dict[str, Any], rng):
        def _norm(x):
            # uint8 host batches (cfg.TPU_UINT8_INPUT): normalize on
            # device exactly as the host pipeline would — x/127.5-1 is
            # bit-identical to ToTensor+Normalize(0.5,0.5) since
            # 2/255 == 1/127.5 (reference datasets.py:190-192).
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 127.5 - 1.0
            return x

        batch = dict(batch)
        batch['real'] = tuple(_norm(x) for x in batch['real'])
        batch['wrong'] = tuple(_norm(x) for x in batch['wrong'])
        bsz = batch['real'][0].shape[0]
        if bsz % accum:
            raise ValueError(
                'TPU_GRAD_ACCUM=%d must divide the per-device batch %d'
                % (accum, bsz))
        micro = bsz // accum

        # Gradient accumulation (TPU_GRAD_ACCUM=k) treats each microbatch
        # as a VIRTUAL data-parallel replica: per-microbatch BatchNorm
        # statistics, RNG folded by virtual replica index
        # axis_index*k + j, and gradients/running-stats/metrics averaged
        # over microbatches before the single Adam update — exactly the
        # math a k-times-larger shard_map mesh produces, so
        # (mesh n, accum k) reproduces a mesh n*k run's numerics on fewer
        # chips (tests/test_train_step.py::test_grad_accum_matches_mesh).
        def mb(x, j):
            return x[j * micro:(j + 1) * micro] if accum > 1 else x

        def mb_noise_rngs(j):
            r = rng
            if coll_mesh is not None:
                r = jax.random.fold_in(
                    r, jax.lax.axis_index(DATA_AXIS) * accum + j)
            elif accum > 1:
                r = jax.random.fold_in(r, j)
            k_noise, k_reparam, k_prior = jax.random.split(r, 3)
            noise = jax.random.normal(k_noise, (micro, z_dim), jnp.float32)
            return noise, {'reparam': k_reparam, 'cls_prior': k_prior}

        def mb_mean(trees):
            if accum == 1:
                return trees[0]
            return jax.tree.map(
                lambda *xs: sum(xs[1:], xs[0]) / accum, *trees)

        ones = jnp.ones((micro,), jnp.float32)
        zeros = jnp.zeros((micro,), jnp.float32)
        fake_cp = jnp.zeros(
            (micro, entity_p1), jnp.float32).at[:, -1].set(1.0)

        # ---------------- Phase 1: generator forward (once), VJP saved ----
        def make_gen_fn(noise, rngs, j):
            def gen_fn(pg):
                gvars = {'params': pg, 'batch_stats': state.g_batch_stats}
                if single_cond:
                    out, gstate = G.apply(gvars, noise, mb(batch['cond'], j),
                                          train=True, rngs=rngs,
                                          mutable=['batch_stats'])
                    hcodes, mu, logvar, std = out
                    mus, logvars = (mu,), (logvar,)
                    mu_d = mu
                else:
                    out, gstate = G.apply(gvars, noise, mb(batch['txt'], j),
                                          mb(batch['cls_onehot'], j),
                                          train=True, rngs=rngs,
                                          mutable=['batch_stats'])
                    hcodes, mu1, mu2, lv1, lv2, std1, std2 = out
                    mus, logvars = (mu1, mu2), (lv1, lv2)
                    mu_d = fuse_mu(mu1, mu2, cat_z)
                imgs = G.apply(gvars, hcodes, method='image')
                return ((tuple(imgs), mu_d, mus, logvars),
                        gstate['batch_stats'])

            if remat_g:
                # Trade recompute FLOPs for residual HBM traffic in the G
                # backward (the step is HBM-bound; MXU is half idle —
                # PERF.md). 'full': recompute the whole forward from
                # g_params. 'conv': save the checkpoint_name('conv')-tagged
                # matmul/conv/capsule outputs, recompute the BN/GLU
                # elementwise chains between them inside the backward where
                # they fuse into its convs.
                policy = None if remat_g == 'full' else \
                    jax.checkpoint_policies.save_only_these_names('conv')
                return jax.checkpoint(gen_fn, policy=policy)
            return gen_fn

        gen_outs_l, g_vjp_l, g_bs_l, mu_sg_l = [], [], [], []
        for j in range(accum):
            noise, rngs = mb_noise_rngs(j)
            gen_outs, g_vjp, g_bs = jax.vjp(make_gen_fn(noise, rngs, j),
                                            state.g_params, has_aux=True)
            gen_outs_l.append(gen_outs)
            g_vjp_l.append(g_vjp)
            g_bs_l.append(g_bs)
            mu_sg_l.append(jax.lax.stop_gradient(gen_outs[1]))
        new_g_bs = mb_mean(g_bs_l)

        # ---------------- Phase 2: D updates (real/wrong/fake) ------------
        new_d_params: List[Any] = []
        new_d_bs: List[List[Any]] = []  # [i][j] post-D-phase stats
        new_d_opts: List[Any] = []
        errDs = errDs_match = errDs_uncond = errDs_cls = 0.0
        for i in range(num_ds):
            D = Ds[i]
            d_grads_l, d_bs_l = [], []
            errD_l, parts_l = [], []
            for j in range(accum):
                fake_sg = jax.lax.stop_gradient(gen_outs_l[j][0][i])
                mu_sg = mu_sg_l[j]
                real_i = mb(batch['real'][i], j)
                wrong_i = mb(batch['wrong'][i], j)
                real_cp = mb(batch['real_cp'], j)

                def d_loss_fn(pd, i=i, D=D, fake_sg=fake_sg, mu_sg=mu_sg,
                              real_i=real_i, wrong_i=wrong_i,
                              real_cp=real_cp):
                    if grouped_d:
                        # One grouped forward over stacked [real, wrong,
                        # fake] instead of three sequential tower passes:
                        # vmap computes per-group BatchNorm batch
                        # statistics, so each group is normalized exactly
                        # as its own pass would be (the reference's three
                        # separate forwards,
                        # cub_trainer_splitz_cap_ca.py:418-420), while the
                        # convs batch 3x and the stat reductions merge
                        # 3 -> 1 kernels.
                        stats0 = state.d_batch_stats[i]

                        def one_pass(img):
                            out, s = D.apply(
                                {'params': pd, 'batch_stats': stats0},
                                img, mu_sg, train=True,
                                mutable=['batch_stats'])
                            return out, s['batch_stats']

                        outs, stats3 = jax.vmap(one_pass)(jnp.stack(
                            [real_i, wrong_i, fake_sg]))
                        rl = tuple(o[0] for o in outs)
                        wl = tuple(o[1] for o in outs)
                        fl = tuple(o[2] for o in outs)
                        # Sequential running-average threading (real, then
                        # wrong, then fake; new = a*old + (1-a)*batch with
                        # a = BN momentum) combined exactly from the three
                        # independent one-update results:
                        #   s3 = a^2*s_r' + a*s_w' + s_f' - (a^2 + a)*s0
                        from ..nn.blocks import BN_MOMENTUM as a
                        s = {'batch_stats': jax.tree.map(
                            lambda s3, s0: a * a * s3[0] + a * s3[1] + s3[2]
                            - (a * a + a) * s0, stats3, stats0)}
                    else:
                        stats = state.d_batch_stats[i]
                        rl, s = D.apply(
                            {'params': pd, 'batch_stats': stats},
                            real_i, mu_sg, train=True,
                            mutable=['batch_stats'])
                        wl, s = D.apply(
                            {'params': pd, 'batch_stats': s['batch_stats']},
                            wrong_i, mu_sg, train=True,
                            mutable=['batch_stats'])
                        fl, s = D.apply(
                            {'params': pd, 'batch_stats': s['batch_stats']},
                            fake_sg, mu_sg, train=True,
                            mutable=['batch_stats'])
                    errD_real = bce(rl[0], ones)
                    errD_wrong = bce(wl[0], zeros)
                    errD_fake = bce(fl[0], zeros)
                    if len(rl) > 1 and uncond_coeff > 0:
                        errD_match = errD_real + errD_wrong + errD_fake
                        errD_uncond = uncond_coeff * (
                            bce(rl[1], ones) + bce(wl[1], ones)
                            + bce(fl[1], zeros))
                        errD_cls = (ce_loss(rl[2], real_cp)
                                    + ce_loss(fl[2], fake_cp))
                        errD = errD_match + errD_uncond + errD_cls
                    else:
                        errD_match = errD_real + 0.5 * (errD_wrong
                                                        + errD_fake)
                        errD_uncond = errD_cls = jnp.zeros(())
                        errD = errD_match
                    return errD, (s['batch_stats'],
                                  (errD_match, errD_uncond, errD_cls))

                (errD, (d_bs, parts)), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(state.d_params[i])
                d_grads_l.append(d_grads)
                d_bs_l.append(d_bs)
                errD_l.append(errD)
                parts_l.append(parts)

            updates, opt = opt_update(d_tx, mb_mean(d_grads_l),
                                      state.d_opt_states[i],
                                      state.d_params[i])
            new_d_params.append(jax.tree.map(
                lambda p, u: p + u, state.d_params[i], updates))
            new_d_bs.append(d_bs_l)
            new_d_opts.append(opt)
            errDs += mb_mean(errD_l)
            parts = mb_mean(parts_l)
            errDs_match += parts[0]
            errDs_uncond += parts[1]
            errDs_cls += parts[2]

        # ---------------- Phase 3: G loss through the updated Ds ----------
        g_grads_l, aux_l, final_d_bs_l = [], [], []
        for j in range(accum):
            real_cp = mb(batch['real_cp'], j)

            def g_loss_fn(outs, j=j, real_cp=real_cp):
                imgs_, mu_d_, mus_, logvars_ = outs
                match = uncond = cls_ = 0.0
                final_bs = []
                for i in range(num_ds):
                    o, s = Ds[i].apply(
                        {'params': new_d_params[i],
                         'batch_stats': new_d_bs[i][j]},
                        imgs_[i], mu_d_, train=True,
                        mutable=['batch_stats'])
                    match += bce(o[0], ones)
                    if len(o) > 1 and uncond_coeff > 0:
                        uncond += uncond_coeff * bce(o[1], ones)
                        cls_ += ce_loss(o[2], real_cp)
                    final_bs.append(s['batch_stats'])
                kls = [kl_loss(mu, lv) for mu, lv in zip(mus_, logvars_)]
                total = match + uncond + cls_ + sum(kls) * kl_coeff
                if color_coeff > 0 and num_ds > 1:
                    total += color_consistency_loss(imgs_[:num_ds],
                                                    color_coeff)
                return total, (match, uncond, cls_, tuple(kls),
                               tuple(final_bs))

            (errGs_j, aux_j), out_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gen_outs_l[j])
            (g_grads_j,) = g_vjp_l[j](out_grads)
            g_grads_l.append(g_grads_j)
            aux_l.append((errGs_j,) + aux_j[:4])
            final_d_bs_l.append(aux_j[4])

        errGs, g_match, g_uncond, g_cls, kls = mb_mean(aux_l)
        g_updates, g_opt = opt_update(g_tx, mb_mean(g_grads_l),
                                      state.g_opt_state, state.g_params)
        new_g_params = jax.tree.map(lambda p, u: p + u, state.g_params,
                                    g_updates)

        # Per-replica running stats diverge across shards (and across
        # virtual microbatch replicas); keep replicas consistent (and
        # deterministic) by averaging.
        new_g_bs = pmean(new_g_bs)
        final_d_bs = pmean(mb_mean(final_d_bs_l))

        # Optional generator EMA (avg_p = 0.999*avg_p + 0.001*p — the
        # reference's dormant update, cub_trainer_splitz_cap_ca.py:609-610).
        new_ema = state.g_ema_params
        if ema_decay > 0 and state.g_ema_params is not None:
            new_ema = jax.tree.map(
                lambda a, p: a * ema_decay + p * (1.0 - ema_decay),
                state.g_ema_params, new_g_params)

        new_state = TrainState(
            step=state.step + 1,
            g_params=new_g_params,
            g_batch_stats=new_g_bs,
            g_opt_state=g_opt,
            d_params=tuple(new_d_params),
            d_batch_stats=tuple(final_d_bs),
            d_opt_states=tuple(new_d_opts),
            g_ema_params=new_ema,
        )
        metrics = {
            'errD': errDs, 'errD_match': errDs_match,
            'errD_uncond': errDs_uncond, 'errD_cls': errDs_cls,
            'errG': errGs, 'errG_match': g_match, 'errG_uncond': g_uncond,
            'errG_cls': g_cls,
            'kl_sen': kls[0],
            'kl_cls': kls[1] if len(kls) > 1 else jnp.zeros(()),
        }
        # Posterior diagnostics: the reference dumps the batch-mean CA/VC
        # mu and std vectors every epoch (cub_trainer_splitz_cap_ca.py:
        # 655-656) to watch for posterior collapse (std -> 0). Compact
        # scalar form: mean over batch AND dims per conditioning path.
        path_names = ('sen', 'cls')
        for p in range(len(gen_outs_l[0][2])):
            metrics['mu_%s_mean' % path_names[p]] = sum(
                jnp.mean(o[2][p]) for o in gen_outs_l) / accum
            metrics['std_%s_mean' % path_names[p]] = sum(
                jnp.mean(jnp.exp(0.5 * o[3][p])) for o in gen_outs_l) / accum
        metrics = {k: pmean(jnp.asarray(v, jnp.float32))
                   for k, v in metrics.items()}
        # Top-stage fakes, reassembled in global batch order (microbatch j
        # holds rows [j*micro, (j+1)*micro) of the local batch).
        fakes = jax.lax.stop_gradient(
            gen_outs_l[0][0][-1] if accum == 1 else
            jnp.concatenate([o[0][-1] for o in gen_outs_l], axis=0))
        return new_state, metrics, fakes

    # Optional raised conv-scratch budget for the backend compiler
    # (TPU_SCOPED_VMEM_KIB; 0 = default). Only attached when set, so the
    # CPU/virtual-mesh test path never sees a TPU-only option.
    kib = int(getattr(cfg, 'TPU_SCOPED_VMEM_KIB', 0) or 0)
    jit_kw = dict(donate_argnums=(0,))
    # Generic backend-compiler options (TPU_COMPILER_OPTIONS dict; the
    # only way to reach the remote AOT compiler — XLA_FLAGS is rejected
    # by the local client, PERF.md pitfall). Only attached when set, so
    # the CPU/virtual-mesh test path never sees TPU-only options.
    copts = dict(getattr(cfg, 'TPU_COMPILER_OPTIONS', None) or {})
    if kib > 0:
        copts['xla_tpu_scoped_vmem_limit_kib'] = kib
    if copts:
        jit_kw['compiler_options'] = copts

    if mesh is None:
        return jax.jit(local_step, **jit_kw)

    batch_spec = {
        'real': (P(DATA_AXIS),) * num_ds,
        'wrong': (P(DATA_AXIS),) * num_ds,
        'real_cp': P(DATA_AXIS),
    }
    if single_cond:
        batch_spec['cond'] = P(DATA_AXIS)
    else:
        batch_spec['txt'] = P(DATA_AXIS)
        batch_spec['cls_onehot'] = P(DATA_AXIS)

    if gspmd:
        # GSPMD data parallelism: the GLOBAL-batch program, jitted with
        # sharding annotations (params replicated, batch sharded). XLA
        # partitions the convs and inserts the gradient collectives itself;
        # numerics are identical to the same program on one device (see
        # tests/test_train_step.py::test_gspmd_mode_matches_single_device).
        from jax.sharding import NamedSharding
        rep = NamedSharding(mesh, P())
        shard0 = NamedSharding(mesh, P(DATA_AXIS))
        batch_sh = jax.tree.map(
            lambda spec: NamedSharding(mesh, spec), batch_spec,
            is_leaf=lambda x: isinstance(x, P))
        return jax.jit(local_step,
                       in_shardings=(rep, batch_sh, rep),
                       out_shardings=(rep, rep, shard0), **jit_kw)

    if n_shards > 1:
        # ZeRO-1: optimizer-state moment vectors are GLOBAL arrays sharded
        # over the data axis (each device owns 1/N); everything else in the
        # TrainState is replicated. The spec mirrors the optax state
        # structure (flat vector leaves -> sharded, scalars -> replicated).
        def opt_spec(tx):
            s = tx.init(jnp.zeros((n_shards,), jnp.float32))
            return jax.tree.map(
                lambda x: P(DATA_AXIS) if getattr(x, 'ndim', 0) >= 1
                else P(), s)

        from .state import TrainState as TS
        state_spec = TS(
            step=P(), g_params=P(), g_batch_stats=P(),
            g_opt_state=opt_spec(g_tx),
            d_params=P(), d_batch_stats=P(),
            d_opt_states=tuple(opt_spec(d_tx) for _ in range(num_ds)),
            g_ema_params=P(),
        )
    else:
        state_spec = P()

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, batch_spec, P()),
        out_specs=(state_spec, P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded, **jit_kw)


def make_synthetic_batch(cfg, batch_size: int, seed: int = 7):
    """Synthetic step batch matching the strategy schema for a config
    (the single source the benchmarks/tools share — the split-z
    strategies take txt/cls_onehot, the single-cond COCO strategy takes
    cond with soft multi-hot targets; see make_train_step's docstring).
    """
    B = batch_size
    sizes = cfg.branch_sizes()
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    n1 = cfg.GAN.ENTITY_DIM + 1

    def img(k, s):
        x = jnp.tanh(jax.random.normal(k, (B, s, s, 3)))
        if getattr(cfg, 'TPU_UINT8_INPUT', False):
            # match the production input schema (uint8 pyramids,
            # normalized on-device at the step's entry) so benches and
            # the dryrun gate exercise the shipped default
            x = _pm1_to_uint8_dev(x)
        return x

    batch = {
        'real': tuple(img(ks[i], s) for i, s in enumerate(sizes)),
        'wrong': tuple(img(ks[i + 3], s) for i, s in enumerate(sizes)),
    }
    if cfg.DATASET_NAME == 'coco':
        multi = (jax.random.uniform(ks[6], (B, n1)) > 0.7).astype(jnp.float32)
        multi = multi.at[:, 0].set(1.0)
        batch['cond'] = jnp.concatenate(
            [jax.random.normal(ks[7], (B, cfg.TEXT.DIMENSION)), multi],
            axis=1)
        batch['real_cp'] = multi / jnp.sum(multi, axis=1, keepdims=True)
    else:
        cls = jnp.arange(B) % cfg.GAN.ENTITY_DIM
        batch['txt'] = jax.random.normal(ks[6], (B, cfg.TEXT.DIMENSION)) * 0.4
        batch['cls_onehot'] = jax.nn.one_hot(cls, cfg.GAN.ENTITY_DIM)
        batch['real_cp'] = jax.nn.one_hot(cls, n1)
    return batch


def _pm1_to_uint8_dev(x):
    """[-1,1] -> uint8 pixels on device. Device-side twin of
    io_utils.images.pm1_to_uint8 — change both together (parity tests
    tie them)."""
    return jnp.clip((x.astype(jnp.float32) + 1.0) * 127.5,
                    0, 255).astype(jnp.uint8)


def _sample_core(G, train_mode: bool):
    """(g_variables, rng, noise, *cond_args) -> tuple of per-stage images.
    Shared body of make_sample_fn / make_caption_sample_fn."""
    uncond = isinstance(G, GNet) and not G.b_condition

    def sample(g_variables, rng, noise, *cond_args):
        if uncond:
            # B_CONDITION=False: netG(noise) alone (model.py:768-771).
            # The reference's unconditional trainer branch is dead code
            # (main.py:139 imports a nonexistent GANTrainer) — here the
            # path is routed and tested.
            cond_args = ()
        k_rep, k_prior = jax.random.split(rng)
        rngs = {'reparam': k_rep, 'cls_prior': k_prior}
        kw = dict(train=train_mode, rngs=rngs)
        if train_mode:
            out, _ = G.apply(g_variables, noise, *cond_args,
                             mutable=['batch_stats'], **kw)
        else:
            out = G.apply(g_variables, noise, *cond_args, **kw)
        hcodes = out[0]
        imgs = G.apply(g_variables, hcodes, method='image')
        return tuple(imgs)

    return sample


def make_sample_fn(cfg, G, mesh: Mesh = None, train_mode: bool = False):
    """Jitted sampling: (g_variables, noise, cond args...) -> images.

    ``train_mode=False`` uses BatchNorm running averages, matching
    netG.eval() under cfg.TEST.EVAL_MODE (cub_trainer_splitz_cap_ca.py:817).
    """
    return jax.jit(_sample_core(G, train_mode))


def make_caption_sample_fn(cfg, G, mesh: Mesh = None,
                           train_mode: bool = False, pattern: str = 'cls'):
    """ONE jitted call sampling every caption of an eval batch:
    (g_variables, keys[C,2], noise[C,B,Z], emb[C,B,E], <pattern args>)
    -> top-stage images [C, B, H, W, 3] uint8.

    vmap over the caption axis keeps BatchNorm semantics identical to
    the reference's looped per-caption protocol
    (cub_trainer_splitz_cap_ca.py:826-898 — statistics reduce within
    each caption's batch) while batching the convs C-fold and paying ONE
    dispatch + ONE D2H fetch per data batch instead of C. The top-stage
    image is quantized to uint8 on device: 4x fewer transfer bytes
    through the tunneled backend (~27 ms round trip + ~50 ms/MB,
    tools/bench_dispatch.py), and the PNG writer takes uint8 anyway.

    pattern — which cond_args the strategy passes per caption:
      'cond':       (cond[C,B,E+K],)              COCO single-cond
      'cls':        (emb[C,B,E], cls_onehot[B,K]) split-z
      'cls_share':  (emb[C,B,E], None, prior[B,M]) shared cls_prior
    """
    core = _sample_core(G, train_mode)

    def one(g_variables, rng, noise, *cond_args):
        img = core(g_variables, rng, noise, *cond_args)[-1]
        return _pm1_to_uint8_dev(img)

    in_axes = {
        'cond': (None, 0, 0, 0),
        'cls': (None, 0, 0, 0, None),
        'cls_share': (None, 0, 0, 0, None, None),
    }[pattern]
    return jax.jit(jax.vmap(one, in_axes=in_axes))
