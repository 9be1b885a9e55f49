"""Forward parity against the REFERENCE'S OWN torch modules.

Imports `/root/reference/model.py` (read-only, with the unavailable
capsule_layer pip package stubbed — the classes under test don't call
it), transplants the real modules' state_dicts through our converters,
and asserts the forwards agree at f32. This closes the loop the
fabricated-state_dict importer tests can't: the *actual* upstream
implementation computes the same function as ours.

Deterministic surfaces only (encode paths and the full joint-D forward);
the reparameterization draws differ by RNG stream design.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

REF = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, 'model.py')),
    reason='reference repo not mounted')


@pytest.fixture(scope='module')
def ref():
    """(reference model module, reference cfg singleton) with tiny dims."""
    # stub easydict (not installed; miscc/config.py needs only
    # attribute-style set/get on nested dicts)
    if 'easydict' not in sys.modules:
        ed = types.ModuleType('easydict')

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        ed.EasyDict = EasyDict
        sys.modules['easydict'] = ed
    # stub torchvision (not installed; only INCEPTION_V3.__init__ touches
    # it, model.py:18-26, and these tests never instantiate that class)
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.models = types.ModuleType('torchvision.models')
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv.models
    # stub the capsule_layer pip package (ships CUDA kernels; not
    # installed here — model.py imports it at module level, model.py:12)
    if 'capsule_layer' not in sys.modules:
        cap = types.ModuleType('capsule_layer')
        mods = types.ModuleType('capsule_layer.modules')

        class _CapsuleLinear(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        mods.CapsuleLinear = _CapsuleLinear
        cap.modules = mods
        sys.modules['capsule_layer'] = cap
        sys.modules['capsule_layer.modules'] = mods
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from miscc.config import cfg as ref_cfg
    import model as ref_model
    ref_cfg.CUDA = False
    ref_cfg.TEXT.DIMENSION = 12
    ref_cfg.GAN.EMBEDDING_DIM = 8
    ref_cfg.GAN.Z_DIM = 6
    ref_cfg.GAN.MANIFD_DIM = 5
    ref_cfg.GAN.DF_DIM = 16
    ref_cfg.GAN.ENTITY_DIM = 5
    ref_cfg.TRAIN.CAT_Z = 'concat'
    return ref_model, ref_cfg


def _np(t):
    return np.array(t.detach().numpy())


def _set_leaves(vs, mapping):
    """Replace flattened-tree leaves by path suffix."""
    import flax
    flat = dict(flax.traverse_util.flatten_dict(vs))
    for path, val in mapping.items():
        assert path in flat, (path, sorted(flat)[:10])
        assert flat[path].shape == val.shape, (path, flat[path].shape,
                                               val.shape)
        flat[path] = jnp.asarray(val)
    return flax.traverse_util.unflatten_dict(flat)


def test_ca_net_encode_matches_reference(ref):
    ref_model, _ = ref
    from text2img_ekl_tpu.nn.conditioning import CANet
    tnet = ref_model.CA_NET()  # fc: Linear(12, 32) + GLU
    emb = np.random.default_rng(0).normal(size=(3, 12)).astype(np.float32)
    mu_t, lv_t = tnet.encode(torch.tensor(emb))

    m = CANet(ef_dim=8, dtype=jnp.float32)
    vs = m.init({'params': jax.random.PRNGKey(0),
                 'reparam': jax.random.PRNGKey(1)}, jnp.asarray(emb))
    vs = _set_leaves(vs, {
        ('params', 'Dense_0', 'Dense_0', 'kernel'): _np(tnet.fc.weight).T,
        ('params', 'Dense_0', 'Dense_0', 'bias'): _np(tnet.fc.bias)})
    _, mu, lv, _ = m.apply(vs, jnp.asarray(emb),
                           rngs={'reparam': jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(mu), _np(mu_t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lv), _np(lv_t),
                               rtol=1e-5, atol=1e-6)


def test_vc_net_encode_matches_reference(ref):
    ref_model, _ = ref
    from text2img_ekl_tpu.nn import blocks
    from text2img_ekl_tpu.nn.conditioning import VCNet
    tnet = ref_model.VC_NET(cond_dim=4)
    tnet.train()
    rng = np.random.default_rng(1)
    noise = rng.normal(size=(4, 6)).astype(np.float32)
    cond = rng.normal(size=(4, 4)).astype(np.float32)
    mu_t, lv_t = tnet.encode(torch.tensor(np.concatenate([noise, cond], 1)))

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = VCNet(manifd_dim=5, dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0),
                     'reparam': jax.random.PRNGKey(1)},
                    jnp.asarray(noise), jnp.asarray(cond), train=True)
        mapping = {}
        for i, fc in enumerate([tnet.fc1, tnet.fc2, tnet.fc31, tnet.fc32]):
            mapping[('params', 'Dense_%d' % i, 'Dense_0', 'kernel')] = \
                _np(fc.weight).T
            mapping[('params', 'Dense_%d' % i, 'Dense_0', 'bias')] = \
                _np(fc.bias)
        for i, bn in enumerate([tnet.bn_fc1, tnet.bn_fc2]):
            mapping[('params', 'BatchNorm_%d' % i, 'BatchNorm_0',
                     'scale')] = _np(bn.weight)
            mapping[('params', 'BatchNorm_%d' % i, 'BatchNorm_0',
                     'bias')] = _np(bn.bias)
        vs = _set_leaves(vs, mapping)
        (_, mu, lv, _), _ = m.apply(
            vs, jnp.asarray(noise), jnp.asarray(cond), train=True,
            rngs={'reparam': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(np.asarray(mu), _np(mu_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv), _np(lv_t),
                               rtol=1e-4, atol=1e-5)


def test_cond_init_stage_g_matches_reference(ref):
    """The reference COND_INIT_STAGE_G (fc -> BN1d -> GLU -> NCHW 4x4
    reshape -> four upBlocks, model.py:204-235) vs our CondInitStageG —
    in particular the channel-major _to_nhwc_4x4 element order."""
    ref_model, ref_cfg = ref
    from text2img_ekl_tpu.models.generator import CondInitStageG
    from text2img_ekl_tpu.nn import blocks

    ref_cfg.TRAIN.CAT_Z = 'concat'  # in_dim = MANIFD_DIM*2 = 10
    torch.manual_seed(5)
    ngf = 32  # stage width: ngf//16 = 2 output channels at 64px
    tnet = ref_model.COND_INIT_STAGE_G(ngf)
    tnet.train()
    rng = np.random.default_rng(4)
    c_z = rng.normal(size=(2, 10)).astype(np.float32)
    out_t = tnet(torch.tensor(c_z))

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = CondInitStageG(ngf, dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(c_z),
                    train=True)
        mapping = {
            ('params', 'fc', 'Dense_0', 'kernel'):
                _np(tnet.fc[0].weight).T,
            ('params', 'bn', 'BatchNorm_0', 'scale'):
                _np(tnet.fc[1].weight),
            ('params', 'bn', 'BatchNorm_0', 'bias'):
                _np(tnet.fc[1].bias),
            ('batch_stats', 'bn', 'BatchNorm_0', 'mean'):
                _np(tnet.fc[1].running_mean),
            ('batch_stats', 'bn', 'BatchNorm_0', 'var'):
                _np(tnet.fc[1].running_var),
        }
        for i in range(1, 5):
            up = getattr(tnet, 'upsample%d' % i)
            pre = ('up', 'upsample%d' % i)
            mapping[('params',) + pre + ('Conv3x3_0', 'Conv_0', 'kernel')] \
                = _np(up[1].weight).transpose(2, 3, 1, 0)
            bnp = ('params',) + pre + ('BatchNorm_0', 'BatchNorm_0')
            bns = ('batch_stats',) + pre + ('BatchNorm_0', 'BatchNorm_0')
            mapping[bnp + ('scale',)] = _np(up[2].weight)
            mapping[bnp + ('bias',)] = _np(up[2].bias)
            mapping[bns + ('mean',)] = _np(up[2].running_mean)
            mapping[bns + ('var',)] = _np(up[2].running_var)
        vs = _set_leaves(vs, mapping)
        out, _ = m.apply(vs, jnp.asarray(c_z), train=True,
                         mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    # tolerance: six stacked BatchNorms amplify the f32 variance-formula
    # difference (flax E[x^2]-E[x]^2 vs torch's direct moments) to ~1e-3
    # absolute through this stage; a layout/order bug would be O(1).
    np.testing.assert_allclose(
        np.asarray(out), _np(out_t).transpose(0, 2, 3, 1),
        rtol=1e-2, atol=2e-3)


def test_next_stage_g_and_torgb_match_reference(ref):
    """The reference NEXT_STAGE_G (tile + concat jointConv + ResBlocks +
    upBlock, model.py:379-423) and GET_IMAGE_G (model.py:426-437) vs our
    NextStageG (running the tile-free split jointConv rewrite) and ToRGB
    with transplanted weights."""
    ref_model, ref_cfg = ref
    from text2img_ekl_tpu.models.generator import NextStageG, ToRGB
    from text2img_ekl_tpu.nn import blocks

    ref_cfg.GAN.B_CONDITION = True  # ef_dim = EMBEDDING_DIM*2 under concat
    ref_cfg.TREE.SCALE = 2
    torch.manual_seed(4)
    ngf, efg = 8, 16
    tnet = ref_model.NEXT_STAGE_G(ngf, num_residual=2)
    tnet.train()
    timg = ref_model.GET_IMAGE_G(ngf // 2)
    rng = np.random.default_rng(3)
    h = rng.normal(size=(2, 8, 8, ngf)).astype(np.float32)
    c = rng.normal(size=(2, efg)).astype(np.float32)
    out_t = tnet(torch.tensor(np.ascontiguousarray(
        np.transpose(h, (0, 3, 1, 2)))), torch.tensor(c))
    img_t = timg(out_t)

    def convbn(mapping, prefix, tconv, tbn):
        mapping[('params',) + prefix + ('Conv3x3_0', 'Conv_0', 'kernel')] \
            = _np(tconv.weight).transpose(2, 3, 1, 0)
        bnp = ('params',) + prefix + ('BatchNorm_0', 'BatchNorm_0')
        bns = ('batch_stats',) + prefix + ('BatchNorm_0', 'BatchNorm_0')
        mapping[bnp + ('scale',)] = _np(tbn.weight)
        mapping[bnp + ('bias',)] = _np(tbn.bias)
        mapping[bns + ('mean',)] = _np(tbn.running_mean)
        mapping[bns + ('var',)] = _np(tbn.running_var)

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = NextStageG(ngf, efg, num_residual=2, scale=2, dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(h),
                    jnp.asarray(c), train=True)
        mapping = {}
        convbn(mapping, ('jointConv',), tnet.jointConv[0], tnet.jointConv[1])
        for i in range(2):
            blk = tnet.residual[i].block
            convbn(mapping, ('residual_%d' % i,), blk[0], blk[1])
            mapping[('params', 'residual_%d' % i, 'Conv3x3_1', 'Conv_0',
                     'kernel')] = _np(blk[3].weight).transpose(2, 3, 1, 0)
            bnp = ('params', 'residual_%d' % i, 'BatchNorm_1', 'BatchNorm_0')
            bns = ('batch_stats', 'residual_%d' % i, 'BatchNorm_1',
                   'BatchNorm_0')
            mapping[bnp + ('scale',)] = _np(blk[4].weight)
            mapping[bnp + ('bias',)] = _np(blk[4].bias)
            mapping[bns + ('mean',)] = _np(blk[4].running_mean)
            mapping[bns + ('var',)] = _np(blk[4].running_var)
        convbn(mapping, ('upsample',), tnet.upsample[1], tnet.upsample[2])
        vs = _set_leaves(vs, mapping)
        out, _ = m.apply(vs, jnp.asarray(h), jnp.asarray(c), train=True,
                         mutable=['batch_stats'])

        mi = ToRGB(ngf // 2, dtype=jnp.float32)
        vsi = mi.init({'params': jax.random.PRNGKey(1)}, out)
        vsi = _set_leaves(vsi, {
            ('params', 'Conv3x3_0', 'Conv_0', 'kernel'):
                _np(timg.img[0].weight).transpose(2, 3, 1, 0)})
        img = mi.apply(vsi, out)
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(
        np.asarray(out), _np(out_t).transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(img), _np(img_t).transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-5)


def _tower_mapping(enc, prefix=('tower', 'encode16')):
    """encode_image_by_16times (model.py:832-850) -> our EncodeBy16 paths."""
    mapping = {('params',) + prefix + ('Conv4x4s2_0', 'Conv_0', 'kernel'):
               _np(enc[0].weight).transpose(2, 3, 1, 0)}
    for i, (ci, bi) in enumerate([(2, 3), (5, 6), (8, 9)]):
        pre = prefix + ('DownBlock_%d' % i,)
        mapping[('params',) + pre + ('Conv4x4s2_0', 'Conv_0', 'kernel')] \
            = _np(enc[ci].weight).transpose(2, 3, 1, 0)
        bnp = ('params',) + pre + ('BatchNorm_0', 'BatchNorm_0')
        bns = ('batch_stats',) + pre + ('BatchNorm_0', 'BatchNorm_0')
        mapping[bnp + ('scale',)] = _np(enc[bi].weight)
        mapping[bnp + ('bias',)] = _np(enc[bi].bias)
        mapping[bns + ('mean',)] = _np(enc[bi].running_mean)
        mapping[bns + ('var',)] = _np(enc[bi].running_var)
    return mapping


def _convbn_mapping(mapping, prefix, tconv, tbn):
    """conv+BN pairs (downBlock/Block3x3_leakRelu Sequentials) -> flax."""
    kname = 'Conv4x4s2_0' if tconv.kernel_size[0] == 4 else 'Conv3x3_0'
    mapping[('params',) + prefix + (kname, 'Conv_0', 'kernel')] \
        = _np(tconv.weight).transpose(2, 3, 1, 0)
    bnp = ('params',) + prefix + ('BatchNorm_0', 'BatchNorm_0')
    bns = ('batch_stats',) + prefix + ('BatchNorm_0', 'BatchNorm_0')
    mapping[bnp + ('scale',)] = _np(tbn.weight)
    mapping[bnp + ('bias',)] = _np(tbn.bias)
    mapping[bns + ('mean',)] = _np(tbn.running_mean)
    mapping[bns + ('var',)] = _np(tbn.running_var)


def _deep_tower_mapping(mapping, downs, squeezes, prefix=('tower',)):
    """The >64px pyramid past encode16: img_code_s32[/s64] downBlocks then
    the channel-squeeze Block3x3_leakRelus (model.py:1016-1018,
    1164-1168) -> our _DownTower downs_i/squeezes_i."""
    for i, blk in enumerate(downs):
        _convbn_mapping(mapping, prefix + ('downs_%d' % i,), blk[0], blk[1])
    for i, blk in enumerate(squeezes):
        _convbn_mapping(mapping, prefix + ('squeezes_%d' % i,),
                        blk[0], blk[1])


def _fc_nchw_to_nhwc(wt):
    """torch Linear weight [out, C*16] over the NCHW flatten (c*16+s) ->
    flax kernel [16*C, out] over the NHWC flatten (s*C+c)."""
    out, cs = wt.shape
    c = cs // 16
    return wt.reshape(out, c, 16).transpose(2, 1, 0).reshape(cs, out)


@pytest.mark.parametrize('imsize', [64, 128, 256, 512, 1024])
def test_d_net_forward_matches_reference(ref, imsize):
    """Legacy per-scale D_NET64..1024 (model.py:874-915, 1006-1051,
    1154-1203, 1261-1373): match + uncond heads, incl. the deeper >64px
    towers. 512/1024 are the reference's own 'not test yet' sketches —
    run at reduced width/batch."""
    ref_model, ref_cfg = ref
    from text2img_ekl_tpu.models.discriminator import DNet
    from text2img_ekl_tpu.nn import blocks

    ref_cfg.GAN.B_CONDITION = True
    big = imsize >= 512
    ndf, bsz = (4, 1) if big else (16, 2)
    old_df = ref_cfg.GAN.DF_DIM
    ref_cfg.GAN.DF_DIM = ndf
    torch.manual_seed(6)
    try:
        tnet = getattr(ref_model, 'D_NET%d' % imsize)()
    finally:
        ref_cfg.GAN.DF_DIM = old_df
    tnet.train()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(bsz, imsize, imsize, 3)).astype(np.float32) * 0.5
    c = rng.normal(size=(bsz, 8)).astype(np.float32)
    out_t, unc_t = tnet(torch.tensor(np.ascontiguousarray(
        np.transpose(x, (0, 3, 1, 2)))), torch.tensor(c))

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = DNet(ndf=ndf, ef_dim=8, imsize=imsize, b_condition=True,
                 dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                    jnp.asarray(c), train=True)
        mapping = _tower_mapping(tnet.img_code_s16)
        if imsize == 128:
            _deep_tower_mapping(mapping, [tnet.img_code_s32],
                                [tnet.img_code_s32_1])
        elif imsize == 256:
            _deep_tower_mapping(
                mapping, [tnet.img_code_s32, tnet.img_code_s64],
                [tnet.img_code_s64_1, tnet.img_code_s64_2])
        elif imsize == 512:
            _deep_tower_mapping(
                mapping,
                [tnet.img_code_s32, tnet.img_code_s64, tnet.img_code_s128],
                [tnet.img_code_s128_1, tnet.img_code_s128_2,
                 tnet.img_code_s128_3])
        elif imsize == 1024:
            _deep_tower_mapping(
                mapping,
                [tnet.img_code_s32, tnet.img_code_s64, tnet.img_code_s128,
                 tnet.img_code_s256],
                [tnet.img_code_s256_1, tnet.img_code_s256_2,
                 tnet.img_code_s256_3, tnet.img_code_s256_4])
        mapping[('params', 'jointConv', 'Conv3x3_0', 'Conv_0', 'kernel')] \
            = _np(tnet.jointConv[0].weight).transpose(2, 3, 1, 0)
        bnp = ('params', 'jointConv', 'BatchNorm_0', 'BatchNorm_0')
        bns = ('batch_stats', 'jointConv', 'BatchNorm_0', 'BatchNorm_0')
        mapping[bnp + ('scale',)] = _np(tnet.jointConv[1].weight)
        mapping[bnp + ('bias',)] = _np(tnet.jointConv[1].bias)
        mapping[bns + ('mean',)] = _np(tnet.jointConv[1].running_mean)
        mapping[bns + ('var',)] = _np(tnet.jointConv[1].running_var)
        for name, tconv in [('logits', tnet.logits[0]),
                            ('uncond_logits', tnet.uncond_logits[0])]:
            mapping[('params', name, 'Conv_0', 'kernel')] \
                = _np(tconv.weight).transpose(2, 3, 1, 0)
            mapping[('params', name, 'Conv_0', 'bias')] = _np(tconv.bias)
        vs = _set_leaves(vs, mapping)
        (out, unc), _ = m.apply(vs, jnp.asarray(x), jnp.asarray(c),
                                train=True, mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(np.asarray(out), _np(out_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(unc), _np(unc_t),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('imsize', [64, 128, 256])
def test_entity_d_net_forward_matches_reference(ref, imsize):
    """Legacy ENTITY_D_NET64/128/256 (model.py:853-870, 980-1002,
    1124-1150): real scalar + class head over the NCHW flatten (our kernel
    input axis is permuted to the NHWC flatten — the same transform
    torch_joint_d_to_flax applies)."""
    ref_model, _ = ref
    from text2img_ekl_tpu.models.discriminator import EntityDNet
    from text2img_ekl_tpu.nn import blocks

    torch.manual_seed(7)
    tnet = getattr(ref_model, 'ENTITY_D_NET%d' % imsize)()
    tnet.train()
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, imsize, imsize, 3)).astype(np.float32) * 0.5
    tp_t, cp_t = tnet(torch.tensor(np.ascontiguousarray(
        np.transpose(x, (0, 3, 1, 2)))))

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = EntityDNet(ndf=16, entity_dim=5, imsize=imsize,
                       dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                    train=True)
        mapping = _tower_mapping(tnet.downsp_16)
        if imsize == 128:
            _deep_tower_mapping(mapping, [tnet.downsp_32],
                                [tnet.downsp_32_1])
        elif imsize == 256:
            _deep_tower_mapping(mapping, [tnet.downsp_32, tnet.downsp_64],
                                [tnet.downsp_64_1, tnet.downsp_64_2])
        for name, fc in [('fc_real', tnet.fc_real), ('fc_ac', tnet.fc_ac)]:
            mapping[('params', name, 'Dense_0', 'kernel')] \
                = _fc_nchw_to_nhwc(_np(fc.weight))
            mapping[('params', name, 'Dense_0', 'bias')] = _np(fc.bias)
        vs = _set_leaves(vs, mapping)
        (tp, cp), _ = m.apply(vs, jnp.asarray(x), train=True,
                              mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(np.asarray(tp), _np(tp_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp), _np(cp_t),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('imsize', [64, 128, 256])
def test_joint_d_forward_matches_reference(ref, imsize):
    """The reference JOINT_D_NET{64,128,256} (model.py:918-977, 1054-1121,
    1206-1258) and our JointDNet compute the same three heads, with the
    real module's state_dict moved through torch_joint_d_to_flax. The 256
    variant is the reference quirk case: ef_dim stays EMBEDDING_DIM (no
    concat-z doubling) and there is no capsule option (model.py:1210)."""
    ref_model, _ = ref
    from text2img_ekl_tpu.io_utils.torch_import import torch_joint_d_to_flax
    from text2img_ekl_tpu.models.discriminator import JointDNet
    from text2img_ekl_tpu.nn import blocks

    cls = getattr(ref_model, 'JOINT_D_NET%d' % imsize)
    torch.manual_seed(3)
    tnet = cls() if imsize == 256 else cls(use_cap=False)
    tnet.train()
    ef_dim = 8 if imsize == 256 else 16
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, imsize, imsize, 3)).astype(np.float32) * 0.5
    c = rng.normal(size=(2, ef_dim)).astype(np.float32)
    # ascontiguousarray: a transposed numpy view hands torch channels-last
    # strides, and the reference's old-torch `.view` calls (model.py:974)
    # reject the resulting non-contiguous conv outputs on modern torch
    sen_t, real_t, cp_t = tnet(
        torch.tensor(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))),
        torch.tensor(c))

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = JointDNet(ndf=16, ef_dim=ef_dim, entity_dim=5, imsize=imsize,
                      use_cap=False, dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(x),
                    jnp.asarray(c), train=True)
        vs = torch_joint_d_to_flax(tnet.state_dict(), vs, imsize)
        (sen, real, cp), _ = m.apply(vs, jnp.asarray(x), jnp.asarray(c),
                                     train=True, mutable=['batch_stats'])
    finally:
        blocks.BN_DTYPE = old
    np.testing.assert_allclose(np.asarray(sen), _np(sen_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(real), _np(real_t),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp), _np(cp_t),
                               rtol=1e-4, atol=1e-4)


def test_g_net_assembly_matches_reference(ref):
    """The FULL unconditional G_NET assembly (model.py:747-808 with
    B_CONDITION=False — the eval_birds GNet path): INIT_STAGE_G ->
    NEXT_STAGE_G chained exactly as the reference wires them (h_net2
    sees the raw z as its condition code), plus the shared GET_IMAGE_G
    heads from get_shareGs (model.py:439-452) through our `image`
    method. Deterministic end to end (no CA reparameterization)."""
    ref_model, ref_cfg = ref
    from text2img_ekl_tpu.models.generator import GNet
    from text2img_ekl_tpu.nn import blocks

    ref_cfg.GAN.B_CONDITION = False
    ref_cfg.TREE.BRANCH_NUM = 2
    ref_cfg.TREE.SCALE = 2
    ref_cfg.GAN.GF_DIM = 16
    torch.manual_seed(8)
    share_gs = ref_model.get_shareGs(ref_cfg.GAN.GF_DIM)
    tnet = ref_model.G_NET(share_gs)
    tnet.train()
    rng = np.random.default_rng(7)
    z = rng.normal(size=(2, 6)).astype(np.float32)
    hcodes_t, mu_t, lv_t = tnet(torch.tensor(z))
    assert mu_t is None and lv_t is None
    imgs_t = [share_gs[i](hcodes_t[i]) for i in range(2)]

    def convbn(mapping, prefix, tconv, tbn):
        mapping[('params',) + prefix + ('Conv3x3_0', 'Conv_0', 'kernel')] \
            = _np(tconv.weight).transpose(2, 3, 1, 0)
        bnp = ('params',) + prefix + ('BatchNorm_0', 'BatchNorm_0')
        bns = ('batch_stats',) + prefix + ('BatchNorm_0', 'BatchNorm_0')
        mapping[bnp + ('scale',)] = _np(tbn.weight)
        mapping[bnp + ('bias',)] = _np(tbn.bias)
        mapping[bns + ('mean',)] = _np(tbn.running_mean)
        mapping[bns + ('var',)] = _np(tbn.running_var)

    old = blocks.BN_DTYPE
    blocks.BN_DTYPE = jnp.float32
    try:
        m = GNet(gf_dim=16, z_dim=6, branch_num=2, r_num=2, scale=2,
                 b_condition=False, dtype=jnp.float32)
        vs = m.init({'params': jax.random.PRNGKey(0)}, jnp.asarray(z),
                    train=True, method='init_all')
        mapping = {
            ('params', 'h_net1', 'fc', 'Dense_0', 'kernel'):
                _np(tnet.h_net1.fc[0].weight).T,
            ('params', 'h_net1', 'bn', 'BatchNorm_0', 'scale'):
                _np(tnet.h_net1.fc[1].weight),
            ('params', 'h_net1', 'bn', 'BatchNorm_0', 'bias'):
                _np(tnet.h_net1.fc[1].bias),
            ('batch_stats', 'h_net1', 'bn', 'BatchNorm_0', 'mean'):
                _np(tnet.h_net1.fc[1].running_mean),
            ('batch_stats', 'h_net1', 'bn', 'BatchNorm_0', 'var'):
                _np(tnet.h_net1.fc[1].running_var),
        }
        for i in range(1, 5):
            up = getattr(tnet.h_net1, 'upsample%d' % i)
            convbn(mapping, ('h_net1', 'up', 'upsample%d' % i), up[1], up[2])
        n2 = tnet.h_net2
        convbn(mapping, ('h_net2', 'jointConv'), n2.jointConv[0],
               n2.jointConv[1])
        for i in range(2):
            blk = n2.residual[i].block
            convbn(mapping, ('h_net2', 'residual_%d' % i), blk[0], blk[1])
            mapping[('params', 'h_net2', 'residual_%d' % i, 'Conv3x3_1',
                     'Conv_0', 'kernel')] = \
                _np(blk[3].weight).transpose(2, 3, 1, 0)
            bnp = ('params', 'h_net2', 'residual_%d' % i, 'BatchNorm_1',
                   'BatchNorm_0')
            bns = ('batch_stats', 'h_net2', 'residual_%d' % i, 'BatchNorm_1',
                   'BatchNorm_0')
            mapping[bnp + ('scale',)] = _np(blk[4].weight)
            mapping[bnp + ('bias',)] = _np(blk[4].bias)
            mapping[bns + ('mean',)] = _np(blk[4].running_mean)
            mapping[bns + ('var',)] = _np(blk[4].running_var)
        convbn(mapping, ('h_net2', 'upsample'), n2.upsample[1],
               n2.upsample[2])
        for k in range(2):
            mapping[('params', 'img_net%d' % (k + 1), 'Conv3x3_0', 'Conv_0',
                     'kernel')] = \
                _np(share_gs[k].img[0].weight).transpose(2, 3, 1, 0)
        vs = _set_leaves(vs, mapping)
        (hcodes, mu, lv), _ = m.apply(vs, jnp.asarray(z), train=True,
                                      mutable=['batch_stats'])
        assert mu is None and lv is None
        imgs = m.apply(vs, hcodes, method='image')
        # Two-path decode (model.py:792-808): product of entity and
        # sentence h-codes through the SAME shared heads.
        sen_codes = tuple(0.5 * h for h in hcodes)
        imgs2 = m.apply(vs, hcodes, sen_codes, method='get_image')
        imgs2_t = tnet.get_image(hcodes_t, [0.5 * h for h in hcodes_t])
    finally:
        blocks.BN_DTYPE = old
    # ~11 stacked train-mode BatchNorms amplify the f32 variance-formula
    # difference (flax E[x^2]-E[x]^2 vs torch direct moments); a wiring
    # or layout bug would be O(1).
    for k in range(2):
        np.testing.assert_allclose(
            np.asarray(hcodes[k]), _np(hcodes_t[k]).transpose(0, 2, 3, 1),
            rtol=1e-2, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(imgs[k]), _np(imgs_t[k]).transpose(0, 2, 3, 1),
            rtol=1e-2, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(imgs2[k]), _np(imgs2_t[k]).transpose(0, 2, 3, 1),
            rtol=1e-2, atol=5e-3)
