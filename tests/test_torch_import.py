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
