"""Reference .pth generator import: name mapping + tensor transforms.

The expected torch state_dict key set below is transcribed BY HAND from the
reference module tree (model.py: COND_G_NET_CATZ_CA:455 with
COND_INIT_STAGE_G_withCap:238, NEXT_STAGE_G:379, GET_IMAGE_G:426, CA_NET:126,
VC_NET:160, upBlock:87, Block3x3_relu:98, ResBlock:107) — independent of the
importer's own mapping — so any drift in torch_import fails here instead of
on a real netG_*.pth file.
"""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.io_utils.torch_import import (
    _flax_path_to_torch, _resolve_init_bn, torch_generator_to_flax)
from text2img_ekl_tpu.models import build_generator
from text2img_ekl_tpu.train.state import create_train_state
from text2img_ekl_tpu.train.step import cond_code_width
from text2img_ekl_tpu.models import build_discriminators

REF_CFG = '/root/reference/cfg/birds_2stg_splitz_cap_ca.realcls.yml'


def _flagship_torch_keys(gf_dim=8):
    """Hand-derived state_dict keys+shapes for the flagship generator at
    GF_DIM=gf_dim (EMBEDDING=MANIFD=Z=128, ENTITY=200, TEXT=1024, R_NUM=2,
    BRANCH=2, SCALE=2, CAT_Z=concat, G_CAPSULE)."""
    ngf = gf_dim * 16
    keys = {}

    def bn(prefix, n):
        keys['%s.weight' % prefix] = (n,)
        keys['%s.bias' % prefix] = (n,)
        keys['%s.running_mean' % prefix] = (n,)
        keys['%s.running_var' % prefix] = (n,)
        keys['%s.num_batches_tracked' % prefix] = ()

    # CA_NET: fc 1024 -> 4*128 (model.py:134-136)
    keys['ca_net1.fc.weight'] = (512, 1024)
    keys['ca_net1.fc.bias'] = (512,)
    # VC_NET(cls_dim=200): fc1(200+128->512), bn, fc2(512->256), bn,
    # fc31/fc32(256->128) (model.py:168-176)
    keys['vc_net2.fc1.weight'] = (512, 328)
    keys['vc_net2.fc1.bias'] = (512,)
    bn('vc_net2.bn_fc1', 512)
    keys['vc_net2.fc2.weight'] = (256, 512)
    keys['vc_net2.fc2.bias'] = (256,)
    bn('vc_net2.bn_fc2', 256)
    keys['vc_net2.fc31.weight'] = (128, 256)
    keys['vc_net2.fc31.bias'] = (128,)
    keys['vc_net2.fc32.weight'] = (128, 256)
    keys['vc_net2.fc32.bias'] = (128,)
    # COND_INIT_STAGE_G_withCap: Sequential(Reshape, CapsuleLinear, Reshape,
    # BatchNorm1d, GLU) -> fc_cap.1 capsule weight [ngf, 32, 8],
    # fc_cap.3 BN over ngf*4*4*2 (model.py:244-252)
    keys['h_net1.fc_cap.1.weight'] = (ngf, 32, 8)
    bn('h_net1.fc_cap.3', ngf * 32)
    # four upBlocks: Sequential(Upsample, conv3x3, BN, GLU) -> .1 conv,
    # .2 BN (model.py:87-94, 256-259)
    c = ngf
    for i in range(1, 5):
        keys['h_net1.upsample%d.1.weight' % i] = (c, c, 3, 3)
        bn('h_net1.upsample%d.2' % i, c)
        c //= 2
    # NEXT_STAGE_G(gf_dim): jointConv = Block3x3_relu(ngf+2*128 -> ngf)
    # (Sequential conv,BN,GLU), residual = 2x ResBlock(block: Sequential
    # conv,BN,GLU,conv,BN), upsample (model.py:398-407)
    g = gf_dim
    keys['h_net2.jointConv.0.weight'] = (2 * g, g + 256, 3, 3)
    bn('h_net2.jointConv.1', 2 * g)
    for i in range(2):
        keys['h_net2.residual.%d.block.0.weight' % i] = (2 * g, g, 3, 3)
        bn('h_net2.residual.%d.block.1' % i, 2 * g)
        keys['h_net2.residual.%d.block.3.weight' % i] = (g, g, 3, 3)
        bn('h_net2.residual.%d.block.4' % i, g)
    keys['h_net2.upsample.1.weight'] = (g, g, 3, 3)
    bn('h_net2.upsample.2', g)
    # GET_IMAGE_G heads: img = Sequential(conv3x3(ngf->3), Tanh)
    keys['img_net1.img.0.weight'] = (3, g, 3, 3)
    keys['img_net2.img.0.weight'] = (3, g // 2, 3, 3)
    return keys


@pytest.fixture(scope='module')
def flagship_g():
    cfg = cfg_from_file(REF_CFG)
    cfg.GAN.GF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg))
    return cfg, G, {'params': state.g_params,
                    'batch_stats': state.g_batch_stats}


def test_mapping_is_a_bijection_with_reference_keys(flagship_g):
    """Every flax leaf maps to a hand-derived reference key, and every
    reference tensor (sans num_batches_tracked) is consumed."""
    _, _, g_vars = flagship_g
    expected = {k for k in _flagship_torch_keys()
                if not k.endswith('num_batches_tracked')}
    mapped = set()
    for path in flax.traverse_util.flatten_dict(g_vars):
        parts = [str(p) for p in path if str(p) not in ('params',
                                                        'batch_stats')]
        key = _flax_path_to_torch(path)
        if key is None:
            key = _resolve_init_bn(path, parts[0], parts[-1],
                                   {k: None for k in expected})
        mapped.add(key)
    assert mapped == expected, (
        'only-in-mapped: %s; only-in-reference: %s'
        % (sorted(mapped - expected)[:8], sorted(expected - mapped)[:8]))


def test_state_dict_roundtrip_values_and_forward(flagship_g):
    torch = pytest.importorskip('torch')
    cfg, G, g_vars = flagship_g
    rs = np.random.RandomState(0)
    sd = {}
    for k, shape in _flagship_torch_keys().items():
        if k.endswith('num_batches_tracked'):
            sd['module.' + k] = torch.tensor(0)
            continue
        val = rs.randn(*shape).astype('float32') * 0.05
        if k.endswith('running_var'):
            val = np.abs(val) + 1.0
        sd['module.' + k] = torch.tensor(val)

    out = torch_generator_to_flax(sd, g_vars)
    flat = flax.traverse_util.flatten_dict(out)

    # Dense: torch [out,in] -> flax [in,out]
    ca_kernel = [v for p, v in flat.items()
                 if p[1] == 'ca_net1' and p[-1] == 'kernel'][0]
    np.testing.assert_array_equal(
        ca_kernel, sd['module.ca_net1.fc.weight'].numpy().T)
    # Conv: OIHW -> HWIO
    rgb = flat[('params', 'img_net1', 'Conv3x3_0', 'Conv_0', 'kernel')]
    np.testing.assert_array_equal(
        rgb, sd['module.img_net1.img.0.weight'].numpy().transpose(2, 3, 1, 0))
    # capsule weight: identical layout on both sides
    cap = flat[('params', 'h_net1', 'fc_cap', 'weight')]
    np.testing.assert_array_equal(
        cap, sd['module.h_net1.fc_cap.1.weight'].numpy())
    # BN stats landed in batch_stats
    var = flat[('batch_stats', 'vc_net2', 'BatchNorm_0', 'BatchNorm_0',
                'var')]
    np.testing.assert_array_equal(
        var, sd['module.vc_net2.bn_fc1.running_var'].numpy())

    # the converted generator runs end to end (eval mode, cls_prior off)
    import jax.numpy as jnp
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    sen = jnp.ones((B, cfg.TEXT.DIMENSION)) * 0.01
    cls = jax.nn.one_hot(jnp.arange(B), cfg.GAN.ENTITY_DIM)
    fwd = jax.jit(lambda v, n, s, c: G.apply(
        v, n, s, c, train=False,
        rngs={'reparam': jax.random.PRNGKey(0),
              'cls_prior': jax.random.PRNGKey(1)}))
    hcodes = fwd(out, noise, sen, cls)[0]
    imgs = G.apply(out, hcodes, method='image')
    assert imgs[-1].shape == (B, 128, 128, 3)
    assert bool(jnp.all(jnp.isfinite(imgs[-1])))


def test_pth_file_loading(flagship_g, tmp_path):
    torch = pytest.importorskip('torch')
    cfg, G, g_vars = flagship_g
    from text2img_ekl_tpu.io_utils.torch_import import load_torch_generator
    rs = np.random.RandomState(1)
    sd = {}
    for k, shape in _flagship_torch_keys().items():
        if k.endswith('num_batches_tracked'):
            sd['module.' + k] = torch.tensor(0)
        else:
            val = rs.randn(*shape).astype('float32') * 0.05
            if k.endswith('running_var'):
                val = np.abs(val) + 1.0
            sd['module.' + k] = torch.tensor(val)
    p = str(tmp_path / 'netG_210000.pth')
    torch.save(sd, p)
    out = load_torch_generator(p, g_vars)
    flat = flax.traverse_util.flatten_dict(out)
    np.testing.assert_array_equal(
        flat[('params', 'h_net1', 'fc_cap', 'weight')],
        sd['module.h_net1.fc_cap.1.weight'].numpy())


# ---------------------------------------------------------------------------
# JOINT_D_NET import (TRAIN.NET_D): hand-derived key tables transcribed from
# model.py:918-977 (64px) and :1054-1121 (128px), independent of the
# importer's own mapping.

from text2img_ekl_tpu.io_utils.torch_import import (  # noqa: E402
    torch_joint_d_to_flax, _flax_path_to_torch_joint_d)


def _joint_d_torch_keys(imsize, ndf=8, efg=256, entity=200, use_cap=True):
    keys = {}

    def bn(prefix, n):
        keys['%s.weight' % prefix] = (n,)
        keys['%s.bias' % prefix] = (n,)
        keys['%s.running_mean' % prefix] = (n,)
        keys['%s.running_var' % prefix] = (n,)
        keys['%s.num_batches_tracked' % prefix] = ()

    # encode_image_by_16times: convs at .0/.2/.5/.8, BN at .3/.6/.9
    # (model.py:832-850)
    keys['img_code_s16.0.weight'] = (ndf, 3, 4, 4)
    keys['img_code_s16.2.weight'] = (ndf * 2, ndf, 4, 4)
    bn('img_code_s16.3', ndf * 2)
    keys['img_code_s16.5.weight'] = (ndf * 4, ndf * 2, 4, 4)
    bn('img_code_s16.6', ndf * 4)
    keys['img_code_s16.8.weight'] = (ndf * 8, ndf * 4, 4, 4)
    bn('img_code_s16.9', ndf * 8)
    if imsize >= 128:  # downBlock + squeeze (model.py:1068-1070)
        keys['img_code_s32.0.weight'] = (ndf * 16, ndf * 8, 4, 4)
        bn('img_code_s32.1', ndf * 16)
        keys['img_code_s32_1.0.weight'] = (ndf * 8, ndf * 16, 3, 3)
        bn('img_code_s32_1.1', ndf * 8)
    keys['jointConv.0.weight'] = (ndf * 8, ndf * 8 + efg, 3, 3)
    bn('jointConv.1', ndf * 8)
    keys['logits.0.weight'] = (1, ndf * 8, 4, 4)
    keys['logits.0.bias'] = (1,)
    keys['uncond_logits.0.weight'] = (1, ndf * 8, 4, 4)
    keys['uncond_logits.0.bias'] = (1,)
    if use_cap:  # CapsuleLinear [out_caps, out_len, in_len] (model.py:941-944)
        keys['fc_ac_cap.0.weight'] = (entity + 1, 16, ndf * 8)
    else:
        keys['fc_ac.weight'] = (entity + 1, ndf * 8 * 16)
        keys['fc_ac.bias'] = (entity + 1,)
    return keys


@pytest.fixture(scope='module')
def flagship_d():
    cfg = cfg_from_file(REF_CFG)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TPU_CAPSULE_PALLAS = False
    G = build_generator(cfg)
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    state = create_train_state(cfg, G, Ds, jax.random.PRNGKey(0),
                               cond_code_width(cfg))
    d_vars = [{'params': p, 'batch_stats': s}
              for p, s in zip(state.d_params, state.d_batch_stats)]
    return cfg, Ds, d_vars


@pytest.mark.parametrize('imsize', [64, 128])
def test_joint_d_mapping_is_a_bijection(flagship_d, imsize):
    cfg, Ds, d_vars = flagship_d
    ix = {64: 0, 128: 1}[imsize]
    expected = {k for k in _joint_d_torch_keys(imsize, use_cap=True)
                if not k.endswith('num_batches_tracked')}
    mapped = set()
    for path in flax.traverse_util.flatten_dict(d_vars[ix]):
        mapped.add(_flax_path_to_torch_joint_d(path, imsize))
    assert mapped == expected, (
        'only-in-mapped: %s; only-in-reference: %s'
        % (sorted(mapped - expected)[:8], sorted(expected - mapped)[:8]))


def test_joint_d_roundtrip_values_and_forward(flagship_d):
    torch = pytest.importorskip('torch')
    cfg, Ds, d_vars = flagship_d
    rs = np.random.RandomState(3)
    sd = {}
    for k, shape in _joint_d_torch_keys(128, use_cap=True).items():
        if k.endswith('num_batches_tracked'):
            sd['module.' + k] = torch.tensor(0)
            continue
        val = rs.randn(*shape).astype('float32') * 0.05
        if k.endswith('running_var'):
            val = np.abs(val) + 1.0
        sd['module.' + k] = torch.tensor(val)

    out = torch_joint_d_to_flax(sd, d_vars[1], imsize=128)
    flat = flax.traverse_util.flatten_dict(out)
    # conv OIHW -> HWIO
    k0 = flat[('params', 'tower', 'encode16', 'Conv4x4s2_0', 'Conv_0',
               'kernel')]
    np.testing.assert_array_equal(
        k0, sd['module.img_code_s16.0.weight'].numpy().transpose(2, 3, 1, 0))
    # squeeze block BN stats -> batch_stats
    var = flat[('batch_stats', 'tower', 'squeezes_0',
                'BatchNorm_0', 'BatchNorm_0', 'var')]
    np.testing.assert_array_equal(
        var, sd['module.img_code_s32_1.1.running_var'].numpy())
    # capsule classifier weight: identical layout
    cap = flat[('params', 'fc_ac_cap', 'weight')]
    np.testing.assert_array_equal(
        cap, sd['module.fc_ac_cap.0.weight'].numpy())

    # converted D runs end to end
    import jax.numpy as jnp
    B = 2
    img = jnp.zeros((B, 128, 128, 3))
    cond = jnp.zeros((B, 256))
    outs = jax.jit(lambda v, i, c: Ds[1].apply(v, i, c, train=False))(
        out, img, cond)
    assert outs[0].shape == (B,) and outs[1].shape == (B,)
    assert outs[2].shape == (B, cfg.GAN.ENTITY_DIM + 1)
    assert bool(jnp.all(jnp.isfinite(outs[2])))


def test_joint_d_fc_ac_flatten_permutation():
    """The fc_ac kernel permute makes the NHWC-flatten linear layer compute
    the reference's NCHW-flatten function exactly."""
    torch = pytest.importorskip('torch')
    from text2img_ekl_tpu.config import cfg_from_file as _cff
    cfg = _cff(REF_CFG)
    cfg.GAN.GF_DIM = 8
    cfg.GAN.DF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    cfg.TRAIN.D_CAPSULE = False  # Linear classifier variant
    Ds = build_discriminators(cfg, cond_code_width(cfg))
    D = Ds[0]
    v = jax.jit(lambda k: D.init({'params': k},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jnp.zeros((1, 256)), train=True))(
        jax.random.PRNGKey(0))
    rs = np.random.RandomState(5)
    sd = {}
    for k, shape in _joint_d_torch_keys(64, use_cap=False).items():
        if k.endswith('num_batches_tracked'):
            sd[k] = torch.tensor(0)
            continue
        val = rs.randn(*shape).astype('float32') * 0.05
        if k.endswith('running_var'):
            val = np.abs(val) + 1.0
        sd[k] = torch.tensor(val)
    out = torch_joint_d_to_flax(sd, v, imsize=64)
    flat = flax.traverse_util.flatten_dict(out)
    K = flat[('params', 'fc_ac', 'Dense_0', 'Dense_0', 'kernel')] \
        if ('params', 'fc_ac', 'Dense_0', 'Dense_0', 'kernel') in flat \
        else flat[('params', 'fc_ac', 'Dense_0', 'kernel')]
    W = sd['fc_ac.weight'].numpy()          # [201, C*16], NCHW flatten
    b = sd['fc_ac.bias'].numpy()
    C = 64
    x_nchw = rs.randn(2, C, 4, 4).astype('float32')
    y_ref = x_nchw.reshape(2, -1) @ W.T + b
    x_nhwc = x_nchw.transpose(0, 2, 3, 1)
    y_ours = x_nhwc.reshape(2, -1) @ np.asarray(K) + b
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-5, atol=1e-5)


def test_load_torch_discriminator_file(flagship_d, tmp_path):
    torch = pytest.importorskip('torch')
    from text2img_ekl_tpu.io_utils.torch_import import \
        load_torch_discriminator
    cfg, Ds, d_vars = flagship_d
    rs = np.random.RandomState(7)
    for i, imsize in enumerate((64, 128)):
        sd = {}
        for k, shape in _joint_d_torch_keys(imsize, use_cap=True).items():
            if k.endswith('num_batches_tracked'):
                sd['module.' + k] = torch.tensor(0)
                continue
            val = rs.randn(*shape).astype('float32') * 0.05
            if k.endswith('running_var'):
                val = np.abs(val) + 1.0
            sd['module.' + k] = torch.tensor(val)
        p = str(tmp_path / ('netD%d.pth' % i))
        torch.save(sd, p)
        out = load_torch_discriminator(p, d_vars[i], imsize)
        flat = flax.traverse_util.flatten_dict(out)
        np.testing.assert_array_equal(
            flat[('params', 'fc_ac_cap', 'weight')],
            sd['module.fc_ac_cap.0.weight'].numpy())


def test_pth_load_reseeds_ema_from_loaded_weights(flagship_g, tmp_path):
    """TPU_EMA_DECAY>0 + TRAIN.NET_G='.pth': the EMA slot must be
    re-seeded from the LOADED weights — before the fix it kept
    create_train_state's random-init copy, which eval (which prefers the
    averages) would then silently score."""
    torch = pytest.importorskip('torch')
    cfg, G, g_vars = flagship_g
    from text2img_ekl_tpu.io_utils.torch_import import load_torch_generator
    from text2img_ekl_tpu.train.trainer import CondGANTrainer

    rs = np.random.RandomState(3)
    sd = {}
    for k, shape in _flagship_torch_keys().items():
        if k.endswith('num_batches_tracked'):
            sd['module.' + k] = torch.tensor(0)
        else:
            val = rs.randn(*shape).astype('float32') * 0.05
            if k.endswith('running_var'):
                val = np.abs(val) + 1.0
            sd['module.' + k] = torch.tensor(val)
    p = str(tmp_path / 'netG_210000.pth')
    torch.save(sd, p)

    import jax.numpy as jnp
    from text2img_ekl_tpu.train.state import TrainState
    state = TrainState(
        step=jnp.zeros((), jnp.int32), g_params=g_vars['params'],
        g_batch_stats=g_vars['batch_stats'], g_opt_state=None,
        d_params=(), d_batch_stats=(), d_opt_states=(),
        g_ema_params=jax.tree.map(jnp.copy, g_vars['params']))
    # _load_pth_generator reads only (pth_path, state); no trainer needed
    loaded = CondGANTrainer._load_pth_generator(None, p, state)
    for a, q in zip(jax.tree.leaves(loaded.g_ema_params),
                    jax.tree.leaves(loaded.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(q))
    # and the weights really are the .pth's, not the init
    expect = sd['module.h_net1.fc_cap.1.weight'].numpy()
    got = flax.traverse_util.flatten_dict(
        {'params': loaded.g_ema_params})[
            ('params', 'h_net1', 'fc_cap', 'weight')]
    np.testing.assert_array_equal(np.asarray(got), expect)
