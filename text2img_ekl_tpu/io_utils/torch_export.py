"""Flax variables -> reference .pth state_dicts (the reverse of
torch_import).

Completes the interop story both ways: a model trained (or fine-tuned)
here can be handed back to the reference codebase — `netG.state_dict()`
format for COND_G_NET_CATZ_CA-family generators
(cub_trainer_splitz_cap_ca.py:171-178 loads it via
``netG.load_state_dict``) and `netD<i>.pth` format for the joint
discriminators (ibid:180-184). Keys, layouts, and the DataParallel
'module.' prefix match what the reference's save_model writes
(cub_trainer_splitz_cap_ca.py:218-228), so ``load_state_dict(...,
strict=True)`` succeeds on the reference's own modules (proven in
tests/test_torch_export.py against `/root/reference/model.py`).

Tensor transforms are the exact inverses of torch_import's:
flax conv HWIO -> torch OIHW, flax Linear [in,out] -> torch [out,in],
the fc_ac NHWC->NCHW flatten permutation, capsule weights unchanged,
BN scale/bias/mean/var -> weight/bias/running_mean/running_var (plus the
`num_batches_tracked` buffers torch checkpoints carry, set to 0 — they
are unused under torch's default momentum-based running stats).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .torch_import import (_flax_path_to_torch, _flax_path_to_torch_joint_d)


def _to_torch_tensor(path, val) -> np.ndarray:
    parts = [str(p) for p in path if str(p) not in ('params', 'batch_stats')]
    leaf = parts[-1]
    src = np.asarray(val, np.float32)
    if parts[0] == 'fc_ac' and leaf == 'kernel':
        # flax [16*C, out] over the NHWC (s*C + c) flatten -> torch
        # [out, C*16] over the NCHW (c*16 + s) flatten (model.py:972-973)
        cs, out = src.shape
        c = cs // 16
        return src.reshape(16, c, out).transpose(1, 0, 2).reshape(cs, out).T
    if leaf == 'kernel' and src.ndim == 4:
        return src.transpose(3, 2, 0, 1)           # HWIO -> OIHW
    if leaf == 'kernel' and src.ndim == 2:
        return src.T                               # [in,out] -> [out,in]
    return src


def _export(variables: Dict[str, Any], path_to_key,
            module_prefix: bool) -> Dict[str, np.ndarray]:
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    has_cap_init = any('fc_cap' in tuple(map(str, p)) for p in flat)
    sd: Dict[str, np.ndarray] = {}
    for path, val in flat.items():
        key = path_to_key(path)
        if key is None:
            # h_net1's init BN: pairs with fc_cap.3 (capsule variant) or
            # fc.1 (plain) — resolved from the tree itself here
            parts = [str(p) for p in path
                     if str(p) not in ('params', 'batch_stats')]
            from .torch_import import _BN_LEAF
            prefix = '%s.%s' % (parts[0],
                                'fc_cap.3' if has_cap_init else 'fc.1')
            key = '%s.%s' % (prefix, _BN_LEAF[parts[-1]])
        if key in sd:
            raise ValueError('duplicate torch key %s from %r' % (key, path))
        sd[key] = _to_torch_tensor(path, val)
    # torch BN buffers: every running_mean has a num_batches_tracked
    for k in [k for k in sd if k.endswith('running_mean')]:
        sd[k.replace('running_mean', 'num_batches_tracked')] = \
            np.zeros((), np.int64)
    if module_prefix:
        sd = {'module.' + k: v for k, v in sd.items()}
    return sd


def flax_generator_to_torch(variables: Dict[str, Any],
                            module_prefix: bool = True
                            ) -> Dict[str, np.ndarray]:
    """Our generator variables ({'params':..., 'batch_stats':...}) ->
    a reference netG state_dict (numpy values; wrap with torch.tensor or
    use save_torch_generator)."""
    return _export(variables, _flax_path_to_torch, module_prefix)


def flax_joint_d_to_torch(variables: Dict[str, Any], imsize: int,
                          module_prefix: bool = True
                          ) -> Dict[str, np.ndarray]:
    """Our JointDNet variables -> a reference netD<i> state_dict."""
    return _export(variables,
                   lambda p: _flax_path_to_torch_joint_d(p, imsize),
                   module_prefix)


def save_torch_generator(variables: Dict[str, Any], pth_path: str,
                         module_prefix: bool = True) -> None:
    """Write a reference-format netG .pth (torch serialized)."""
    import torch

    sd = {k: torch.tensor(v)
          for k, v in flax_generator_to_torch(variables,
                                              module_prefix).items()}
    torch.save(sd, pth_path)


def save_torch_discriminator(variables: Dict[str, Any], imsize: int,
                             pth_path: str,
                             module_prefix: bool = True) -> None:
    """Write a reference-format netD<i> .pth (torch serialized)."""
    import torch

    sd = {k: torch.tensor(v)
          for k, v in flax_joint_d_to_torch(variables, imsize,
                                            module_prefix).items()}
    torch.save(sd, pth_path)
