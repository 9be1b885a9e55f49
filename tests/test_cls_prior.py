"""TEST.CLS_PRIOR eval path: the class code is replaced by a prior draw
(model.py:485-494; cub_trainer_splitz_cap_ca.py:875-881)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file

REF = '/root/reference/cfg/birds_2stg_splitz_cap_ca_eval.realcls.yml'


@pytest.fixture(scope='module')
def gen():
    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TEST.CLS_PRIOR = True
    from text2img_ekl_tpu.models import build_generator
    G = build_generator(cfg, train_flag=False)
    assert G.use_cls_prior and G.use_cap  # eval yml sets TEST.G_CAPSULE
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    sen = jnp.zeros((B, cfg.TEXT.DIMENSION))
    cls = jnp.zeros((B, cfg.GAN.ENTITY_DIM))
    rngs = {'params': jax.random.PRNGKey(0), 'reparam': jax.random.PRNGKey(0),
            'cls_prior': jax.random.PRNGKey(0)}
    vs = jax.jit(lambda r, *a: G.init(r, *a, train=True,
                                      method='init_all'))(rngs, noise, sen,
                                                          cls)
    return cfg, G, vs


def test_eval_without_class_uses_random_prior(gen):
    """At eval with CLS_PRIOR, no class input is needed: the class code is
    drawn N(0,1) from the cls_prior stream."""
    cfg, G, vs = gen
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    sen = jnp.ones((B, cfg.TEXT.DIMENSION)) * 0.01
    out = G.apply(vs, noise, sen, None, train=False,
                  rngs={'reparam': jax.random.PRNGKey(1),
                        'cls_prior': jax.random.PRNGKey(2)})
    hcodes, mu1, mu2, lv1, lv2, std1, std2 = out
    assert hcodes[-1].shape[1] == cfg.imsize
    # mu2/logvar2 are zeroed placeholders in the prior path (model.py:494)
    assert float(jnp.abs(mu2).sum()) == 0.0
    # different prior keys give different images
    out2 = G.apply(vs, noise, sen, None, train=False,
                   rngs={'reparam': jax.random.PRNGKey(1),
                         'cls_prior': jax.random.PRNGKey(3)})
    assert float(jnp.abs(out2[0][-1] - hcodes[-1]).max()) > 0


def test_eval_with_supplied_prior(gen):
    """An externally supplied cls_prior is used verbatim (the cls_share
    mode, cub_trainer_splitz_cap_ca.py:866-877)."""
    cfg, G, vs = gen
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    sen = jnp.ones((B, cfg.TEXT.DIMENSION)) * 0.01
    prior = jnp.ones((B, cfg.GAN.MANIFD_DIM)) * 0.5
    out = G.apply(vs, noise, sen, None, cls_prior=prior, train=False,
                  rngs={'reparam': jax.random.PRNGKey(1),
                        'cls_prior': jax.random.PRNGKey(2)})
    assert np.all(np.isfinite(np.asarray(out[0][-1])))
    # supplying the same prior twice is deterministic given fixed reparam key
    out2 = G.apply(vs, noise, sen, None, cls_prior=prior, train=False,
                   rngs={'reparam': jax.random.PRNGKey(1),
                         'cls_prior': jax.random.PRNGKey(9)})
    np.testing.assert_allclose(np.asarray(out[0][-1]),
                               np.asarray(out2[0][-1]), atol=1e-6)


def test_train_mode_ignores_cls_prior(gen):
    """During training the VC path is always used (model.py:485-487)."""
    cfg, G, vs = gen
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    sen = jnp.ones((B, cfg.TEXT.DIMENSION)) * 0.01
    cls = jax.nn.one_hot(jnp.array([1, 2]), cfg.GAN.ENTITY_DIM)
    out, _ = G.apply(vs, noise, sen, cls, train=True,
                     rngs={'reparam': jax.random.PRNGKey(1)},
                     mutable=['batch_stats'])
    # mu2 comes from the VC net -> generally nonzero
    assert float(jnp.abs(out[2]).sum()) > 0


def test_uncond_gnet_sampler_routes_without_cond_args():
    """B_CONDITION=False builds GNet; make_sample_fn must call it with
    noise alone even when the trainer's eval loop passes (emb, cls) —
    previously a TypeError (cond arg colliding with train=). The
    reference's unconditional branch is dead code (main.py:139 imports a
    nonexistent GANTrainer); here the path works."""
    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.B_CONDITION = False
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    from text2img_ekl_tpu.models import build_generator
    from text2img_ekl_tpu.models.generator import GNet
    from text2img_ekl_tpu.train.step import make_sample_fn
    G = build_generator(cfg, train_flag=False)
    assert isinstance(G, GNet) and not G.b_condition
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    rngs = {'params': jax.random.PRNGKey(0),
            'reparam': jax.random.PRNGKey(0),
            'cls_prior': jax.random.PRNGKey(0)}
    vs = jax.jit(lambda r, n: G.init(r, n, train=True,
                                     method='init_all'))(rngs, noise)
    sampler = make_sample_fn(cfg, G, train_mode=True)
    emb = jnp.zeros((B, cfg.TEXT.DIMENSION))
    cls = jnp.zeros((B, cfg.GAN.ENTITY_DIM))
    # exactly the trainer.evaluate non-coco call shape — extra cond args
    # are dropped for the unconditional generator
    imgs = sampler(vs, jax.random.PRNGKey(1), noise, emb, cls)
    assert imgs[-1].shape[0] == B
    assert bool(jnp.all(jnp.isfinite(imgs[-1])))
    # and the plain call works too
    imgs2 = sampler(vs, jax.random.PRNGKey(1), noise)
    np.testing.assert_array_equal(np.asarray(imgs[-1]),
                                  np.asarray(imgs2[-1]))


def test_uncond_gnet_state_init_and_train_gate(tmp_path):
    """B_CONDITION=False: create_train_state must init GNet with noise
    alone (previously the txt arg collided with train=), and
    trainer.train() refuses the GNet family with a clear error — the
    EKL step needs the conditional generators, and the reference's own
    unconditional training branch is dead code (main.py:139 imports a
    nonexistent GANTrainer)."""
    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.GAN.B_CONDITION = False
    cfg.TRAIN.FLAG = True
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    cfg.TPU_SYNTHETIC_DATA = True
    cfg.TPU_DATA_PARALLEL = 1
    cfg.WORKERS = 1
    from text2img_ekl_tpu.models import build_generator
    from text2img_ekl_tpu.models.generator import GNet
    from text2img_ekl_tpu.train import create_train_state
    G = build_generator(cfg)
    assert isinstance(G, GNet) and not G.b_condition
    state = create_train_state(cfg, G, [], jax.random.PRNGKey(0), 0)
    assert jax.tree.reduce(lambda a, x: a + x.size, state.g_params, 0) > 0

    from text2img_ekl_tpu.train.trainer import CondGANTrainer
    tr = CondGANTrainer(cfg, str(tmp_path))
    with pytest.raises(NotImplementedError, match='unconditional'):
        tr.train(max_steps=1)
