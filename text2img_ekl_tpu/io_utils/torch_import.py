"""Reference .pth generator checkpoints -> flax variables.

The reference's eval configs point TRAIN.NET_G at torch ``state_dict``
snapshots (e.g. cfg/eval_birds.yml -> netG_210000.pth, saved at
cub_trainer_splitz_cap_ca.py:662-667). This module maps those key names
onto our generator trees so reference-trained weights run here:

  torch module (model.py)              flax module (models/generator.py)
  -----------------------------------  ---------------------------------
  ca_net1.fc                           ca_net1/Dense_0
  vc_net2.fc1/bn_fc1/fc2/bn_fc2/       vc_net2/Dense_0..3, BatchNorm_0..1
    fc31/fc32
  h_net1.fc_cap.{1,3} (cap variant)    h_net1/fc_cap, h_net1/bn
  h_net1.fc_cap1.{1,3} (exchange)      h_net1/fc_cap1, h_net1/bn_c
  h_net1.fc.{0,1} (plain variant)      h_net1/fc, h_net1/bn
  h_net1.upsampleN.{1,2}               h_net1/up/upsampleN (Conv3x3+BN)
  h_netK.jointConv.{0,1}               h_netK/jointConv
  h_netK.residual.I.block.{0,1,3,4}    h_netK/residual_I
  h_netK.upsample{,2}.{1,2}            h_netK/upsample{,2}
  img_netK.img.0                       img_netK/Conv3x3_0

Tensor transforms: torch Linear [out,in] -> flax [in,out]; torch conv OIHW
-> flax HWIO; capsule weights [out_caps, out_len, in_len] are identical in
both; BN weight/bias/running_mean/running_var -> scale/bias/mean/var.
The FC->4x4 reshape keeps NCHW channel-major element order on both sides
(generator.py:_to_nhwc_4x4), so no flat-weight permutation is needed.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

_VC_DENSE = {'Dense_0': 'fc1', 'Dense_1': 'fc2',
             'Dense_2': 'fc31', 'Dense_3': 'fc32'}
_VC_BN = {'BatchNorm_0': 'bn_fc1', 'BatchNorm_1': 'bn_fc2'}
_BN_LEAF = {'scale': 'weight', 'bias': 'bias',
            'mean': 'running_mean', 'var': 'running_var'}


def _flax_path_to_torch(path) -> str:
    """Flax tree path -> reference state_dict key (without 'module.')."""
    parts = [str(p) for p in path]
    parts = [p for p in parts if p not in ('params', 'batch_stats')]
    leaf = parts[-1]
    mods = parts[:-1]
    top = mods[0]

    def bn_key(prefix):
        return '%s.%s' % (prefix, _BN_LEAF[leaf])

    # --- conditioning nets (CA_NET / VC_NET, model.py:126-201) ----------
    # covers both the numbered CAs (ca_net1/2) and GNet's bare 'ca_net'
    if top.startswith('ca_net'):
        return '%s.fc.%s' % (top, leaf if leaf == 'bias' else 'weight')
    if top.startswith('vc_net'):
        m = mods[1]
        if m in _VC_DENSE:
            return '%s.%s.%s' % (top, _VC_DENSE[m],
                                 leaf if leaf == 'bias' else 'weight')
        return bn_key('%s.%s' % (top, _VC_BN[m]))

    # --- toRGB heads (GET_IMAGE_G, model.py:426-437) --------------------
    if top.startswith('img_net'):
        return '%s.img.0.weight' % top

    # --- stage towers ----------------------------------------------------
    assert top.startswith('h_net'), path
    rest = mods[1:]
    sub = rest[0]

    def convbn_tail(prefix, tail, conv_ix, bn_ix):
        """tail like ['Conv3x3_0','Conv_0'] or ['BatchNorm_0','BatchNorm_0']."""
        if tail[0].startswith('Conv3x3'):
            return '%s.%d.weight' % (prefix, conv_ix)
        return bn_key('%s.%d' % (prefix, bn_ix))

    if sub == 'up':  # init-stage _UpStack: torch has h_net1.upsampleN direct
        ups = rest[1]  # upsample1..4
        return convbn_tail('%s.%s' % (top, ups), rest[2:], 1, 2)
    if sub.startswith('upsample'):  # NextStageG upsample / upsample2
        return convbn_tail('%s.%s' % (top, sub), rest[1:], 1, 2)
    if sub == 'jointConv':
        return convbn_tail('%s.jointConv' % top, rest[1:], 0, 1)
    if sub.startswith('residual_'):
        i = int(sub.split('_')[1])
        tail = rest[1:]
        # ResBlock.block: Sequential(conv,BN,GLU,conv,BN) -> 0,1,3,4
        if tail[0] == 'Conv3x3_0':
            return '%s.residual.%d.block.0.weight' % (top, i)
        if tail[0] == 'Conv3x3_1':
            return '%s.residual.%d.block.3.weight' % (top, i)
        if tail[0] == 'BatchNorm_0':
            return bn_key('%s.residual.%d.block.1' % (top, i))
        return bn_key('%s.residual.%d.block.4' % (top, i))
    # --- init-stage first FC: plain / capsule / exchange-capsule ---------
    if sub == 'fc':  # COND_INIT_STAGE_G: Sequential(Linear, BN, GLU)
        return '%s.fc.0.weight' % top
    if sub in ('fc_cap', 'fc_cap1'):  # Sequential(Reshape, Capsule, Reshape,
        return '%s.%s.1.weight' % (top, sub)              # BN, GLU)
    if sub == 'bn':  # paired with 'fc' (-> fc.1) or 'fc_cap' (-> fc_cap.3)
        return None  # resolved by caller against available keys
    if sub == 'bn_s':
        return bn_key('%s.fc_cap.3' % top)
    if sub == 'bn_c':
        return bn_key('%s.fc_cap1.3' % top)
    raise KeyError('no torch mapping for flax path %r' % (path,))


def _resolve_init_bn(path, top, leaf, state_dict):
    """h_net1's 'bn' pairs with fc.1 (plain) or fc_cap.3 (capsule)."""
    for prefix in ('%s.fc_cap.3' % top, '%s.fc.1' % top):
        key = '%s.%s' % (prefix, _BN_LEAF[leaf])
        if key in state_dict:
            return key
    raise KeyError('no torch BN for %r' % (path,))


def torch_generator_to_flax(state_dict: Dict[str, Any],
                            flax_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference netG state_dict onto our generator tree.

    ``state_dict`` values may be torch tensors or numpy arrays; DataParallel
    'module.' prefixes are stripped (the reference always wraps,
    cub_trainer_splitz_cap_ca.py:139). Raises KeyError on unmapped params.
    """
    import flax

    sd = {}
    for k, v in state_dict.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if k.endswith('num_batches_tracked'):
            continue
        sd[k] = np.asarray(getattr(v, 'numpy', lambda: v)())

    flat = flax.traverse_util.flatten_dict(flax_variables)
    new = {}
    used = set()
    missing = []
    for path, val in flat.items():
        parts = [str(p) for p in path if str(p) not in ('params',
                                                        'batch_stats')]
        leaf = parts[-1]
        key = _flax_path_to_torch(path)
        if key is None:
            key = _resolve_init_bn(path, parts[0], leaf, sd)
        if key not in sd:
            missing.append('%s -> %s' % ('/'.join(parts), key))
            new[path] = val
            continue
        src = sd[key]
        used.add(key)
        if leaf == 'kernel' and src.ndim == 4:
            src = src.transpose(2, 3, 1, 0)        # OIHW -> HWIO
        elif leaf == 'kernel' and src.ndim == 2:
            src = src.T                            # [out,in] -> [in,out]
        if src.shape != tuple(val.shape):
            raise ValueError('shape mismatch at %s (%s): %s vs %s'
                             % ('/'.join(parts), key, src.shape, val.shape))
        new[path] = src.astype(np.float32)
    if missing:
        raise KeyError('unmapped generator params: %s' % missing[:20])
    unused = sorted(set(sd) - used)
    if unused:
        print('!! torch import: %d unused checkpoint entries (e.g. %s)'
              % (len(unused), unused[:5]))
    return flax.traverse_util.unflatten_dict(new)


def load_torch_generator(pth_path: str, flax_variables: Dict[str, Any]):
    """Load a reference netG .pth (torch serialized state_dict) and convert."""
    import torch

    sd = torch.load(pth_path, map_location='cpu', weights_only=True)
    return torch_generator_to_flax(sd, flax_variables)


# ---------------------------------------------------------------------------
# JOINT_D_NET .pth import (TRAIN.NET_D resume): the reference restores each
# joint discriminator from '%s%d.pth' % (NET_D, i)
# (cub_trainer_splitz_cap_ca.py:179-184). Torch module tree
# (model.py:918-977 / 1054-1121 / 1206-1256):
#
#   img_code_s16         Sequential(conv,lrelu, conv,BN,lrelu, conv,BN,lrelu,
#                        conv,BN,lrelu) -> convs at 0,2,5,8; BN at 3,6,9
#   img_code_s32[/s64]   downBlock: conv at .0, BN at .1      (128/256px)
#   img_code_s32_1       Block3x3_leakRelu: conv .0, BN .1    (128px)
#   img_code_s64_1/_2    two squeeze blocks                    (256px)
#   jointConv            Block3x3_leakRelu: conv .0, BN .1
#   logits / uncond_logits  Sequential(Conv2d 4x4 s4, Sigmoid): .0.{weight,bias}
#   fc_ac                Linear(8ndf*4*4 -> ENTITY+1)  — NCHW flatten order!
#   fc_ac_cap            Sequential(CapsuleLinear): .0.weight
#                        [out_caps, out_len, in_len], identical layout here.

_ENC_CONV_IX = [0, 2, 5, 8]
_ENC_BN_IX = [None, 3, 6, 9]


def _joint_d_squeeze_names(imsize: int):
    """Torch scope names of the channel-squeeze blocks past the tower."""
    return {64: [], 128: ['img_code_s32_1'],
            256: ['img_code_s64_1', 'img_code_s64_2']}[imsize]


def _flax_path_to_torch_joint_d(path, imsize: int) -> str:
    parts = [str(p) for p in path if str(p) not in ('params', 'batch_stats')]
    leaf = parts[-1]
    mods = parts[:-1]
    top = mods[0]

    def bn_key(prefix):
        return '%s.%s' % (prefix, _BN_LEAF[leaf])

    if top == 'tower':
        sub = mods[1]
        if sub == 'encode16':
            if mods[2].startswith('Conv4x4s2'):
                # the bare first conv (Conv4x4s2_0) or inside DownBlock
                return 'img_code_s16.0.weight'
            k = int(mods[2].split('_')[1]) + 1  # DownBlock_0 -> 2nd conv
            if mods[3].startswith('Conv'):
                return 'img_code_s16.%d.weight' % _ENC_CONV_IX[k]
            return bn_key('img_code_s16.%d' % _ENC_BN_IX[k])
        if sub.startswith('downs_'):
            i = int(sub.split('_')[1])
            scope = 'img_code_s%d' % (32 << i)
            if mods[2].startswith('Conv'):
                return '%s.0.weight' % scope
            return bn_key('%s.1' % scope)
        if sub.startswith('squeezes_'):
            j = int(sub.split('_')[1])
            scope = _joint_d_squeeze_names(imsize)[j]
            if mods[2].startswith('Conv3x3'):
                return '%s.0.weight' % scope
            return bn_key('%s.1' % scope)
        raise KeyError('no torch mapping for %r' % (path,))
    if top == 'jointConv':
        if mods[1].startswith('Conv3x3'):
            return 'jointConv.0.weight'
        return bn_key('jointConv.1')
    if top in ('logits', 'uncond_logits'):
        return '%s.0.%s' % (top, {'kernel': 'weight', 'bias': 'bias'}[leaf])
    if top == 'fc_ac':
        return 'fc_ac.%s' % ({'kernel': 'weight', 'bias': 'bias'}[leaf])
    if top == 'fc_ac_cap':
        return 'fc_ac_cap.0.weight'
    raise KeyError('no torch mapping for %r' % (path,))


def torch_joint_d_to_flax(state_dict: Dict[str, Any],
                          flax_variables: Dict[str, Any],
                          imsize: int) -> Dict[str, Any]:
    """Convert a reference netD<i> state_dict onto our JointDNet tree.

    Tensor transforms as in the generator importer, plus one layout fix:
    ``fc_ac.weight`` is a Linear over the NCHW flatten of the 4x4 code
    (model.py:972-973, index c*16+s) while our NHWC flatten is s*C+c — the
    kernel's input axis is permuted accordingly so the imported layer
    computes the identical function.
    """
    import flax

    sd = {}
    for k, v in state_dict.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if k.endswith('num_batches_tracked'):
            continue
        sd[k] = np.asarray(getattr(v, 'numpy', lambda: v)())

    flat = flax.traverse_util.flatten_dict(flax_variables)
    new = {}
    used = set()
    missing = []
    for path, val in flat.items():
        parts = [str(p) for p in path if str(p) not in ('params',
                                                        'batch_stats')]
        leaf = parts[-1]
        key = _flax_path_to_torch_joint_d(path, imsize)
        if key not in sd:
            missing.append('%s -> %s' % ('/'.join(parts), key))
            new[path] = val
            continue
        src = sd[key]
        used.add(key)
        if parts[0] == 'fc_ac' and leaf == 'kernel':
            out, cs = src.shape            # [ENTITY+1, C*16]
            c = cs // 16
            src = src.reshape(out, c, 16).transpose(2, 1, 0).reshape(cs, out)
        elif leaf == 'kernel' and src.ndim == 4:
            src = src.transpose(2, 3, 1, 0)        # OIHW -> HWIO
        elif leaf == 'kernel' and src.ndim == 2:
            src = src.T                            # [out,in] -> [in,out]
        if src.shape != tuple(val.shape):
            raise ValueError('shape mismatch at %s (%s): %s vs %s'
                             % ('/'.join(parts), key, src.shape, val.shape))
        new[path] = src.astype(np.float32)
    if missing:
        raise KeyError('unmapped discriminator params: %s' % missing[:20])
    unused = sorted(set(sd) - used)
    if unused:
        print('!! torch D import: %d unused checkpoint entries (e.g. %s)'
              % (len(unused), unused[:5]))
    return flax.traverse_util.unflatten_dict(new)


def load_torch_discriminator(pth_path: str, flax_variables: Dict[str, Any],
                             imsize: int):
    """Load a reference netD<i>.pth and convert for a JointDNet at
    ``imsize``."""
    import torch

    sd = torch.load(pth_path, map_location='cpu', weights_only=True)
    return torch_joint_d_to_flax(sd, flax_variables, imsize)
