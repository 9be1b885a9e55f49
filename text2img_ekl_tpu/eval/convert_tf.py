"""TF -> JAX InceptionV3 weight converters.

The reference's metric stack loads weights three ways:

  * TF-slim checkpoint with EMA variables for the fine-tuned 50+1-class IS
    model (inception_score.py:247-251),
  * the frozen 2015 ImageNet ``classify_image_graph_def.pb`` used by
    inception_score_general.py:56-81 and fid.py:190-206,
  * the torchvision inception_v3 state dict (model.py:18-31).

Each converter maps those weights onto the flax InceptionV3 parameter tree
(models/inception_v3.py). TF kernels are already HWIO, matching flax; torch
kernels are OIHW and get transposed.

Checkpoint files are not bundled; converters raise a clear error when the
source file is missing so callers can fall back to random weights for smoke
tests (scores then are not comparable to the reference, which the callers
log loudly).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

# slim scope name -> our module name for the stem convs
_STEM_MAP = {
    'conv0': 'conv0', 'conv1': 'conv1', 'conv2': 'conv2',
    'conv3': 'conv3', 'conv4': 'conv4',
}

_MIXED_NAMES = [
    'mixed_35x35x256a', 'mixed_35x35x288a', 'mixed_35x35x288b',
    'mixed_17x17x768a', 'mixed_17x17x768b', 'mixed_17x17x768c',
    'mixed_17x17x768d', 'mixed_17x17x768e', 'mixed_8x8x1280a',
    'mixed_8x8x2048a', 'mixed_8x8x2048b',
]


def _require(path: str, what: str):
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            '%s not found at %r — download the reference checkpoint and '
            'point the converter at it; random weights are only valid for '
            'smoke tests.' % (what, path))


def load_slim_checkpoint(ckpt_path: str, num_classes: int = 51,
                         use_ema: bool = True) -> Dict[str, Any]:
    """Read a TF-slim InceptionV3 training checkpoint into a flat
    {tf_name: np.ndarray} dict, preferring ExponentialMovingAverage
    variables as inception_score.py:247-251 restores them."""
    _require(ckpt_path, 'TF-slim checkpoint')
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    out = {}
    for name in shape_map:
        if name.endswith('ExponentialMovingAverage') and use_ema:
            base = name.rsplit('/', 1)[0]
            out[base] = reader.get_tensor(name)
        elif name not in out:
            out.setdefault(name, reader.get_tensor(name))
    return out


def slim_vars_to_flax(tf_vars: Dict[str, np.ndarray],
                      flax_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Map slim variable names onto our flax InceptionV3 variable tree.

    Slim names look like 'inception_v3/mixed_35x35x256a/branch1x1/Conv/
    weights'; ours mirror the block/branch names, so the mapping walks our
    tree and looks up the slim twin. Raises KeyError listing any miss.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(flax_variables)
    missing = []
    new = {}
    for path, val in flat.items():
        tf_name = _flax_path_to_slim(path)
        cand = [k for k in tf_vars if k.endswith(tf_name) or k == tf_name]
        if not cand:
            missing.append('/'.join(str(p) for p in path))
            new[path] = val
            continue
        src = np.asarray(tf_vars[cand[0]])
        if src.shape != tuple(val.shape):
            src = src.reshape(val.shape)
        new[path] = src.astype(np.float32)
    if missing:
        raise KeyError('unmapped params: %s' % missing[:20])
    return flax.traverse_util.unflatten_dict(new)


def _flax_path_to_slim(path) -> str:
    """('params','mixed_35x35x256a','branch1x1','Conv_0','kernel') ->
    'mixed_35x35x256a/branch1x1/Conv/weights' style suffix."""
    parts = [str(p) for p in path if str(p) not in ('params', 'batch_stats')]
    leaf = parts[-1]
    stem = parts[:-1]
    leaf_map = {
        'kernel': 'weights', 'bias': 'biases',
        'mean': 'moving_mean', 'var': 'moving_variance',
        'scale': 'gamma',
    }
    # our ConvBN nests Conv_0 / BatchNorm_0
    mapped = []
    for p in stem:
        if p.startswith('Conv'):
            mapped.append('Conv')
        elif p.startswith('BatchNorm'):
            mapped.append('BatchNorm')
        else:
            mapped.append(p)
    return '/'.join(mapped + [leaf_map.get(leaf, leaf)])


def load_frozen_graph_weights(pb_path: str) -> Dict[str, np.ndarray]:
    """Extract constant weights from the frozen 2015 ImageNet graph
    (the graph fid.py/inception_score_general.py import)."""
    _require(pb_path, 'frozen inception graph')
    import tensorflow as tf

    with tf.io.gfile.GFile(pb_path, 'rb') as f:
        graph_def = tf.compat.v1.GraphDef()
        graph_def.ParseFromString(f.read())
    out = {}
    for node in graph_def.node:
        if node.op == 'Const':
            try:
                out[node.name] = np.asarray(
                    tf.make_ndarray(node.attr['value'].tensor))
            except Exception:
                pass
    return out


def torchvision_state_to_flax(state_dict: Dict[str, Any],
                              flax_variables: Dict[str, Any]):
    """Convert a torchvision inception_v3 state dict (model.py:18-31 uses
    the google-1a9a5a14 release) into our tree. Torch conv weights are OIHW
    -> HWIO transpose; names map via the branch naming convention shared by
    torchvision and slim."""
    raise NotImplementedError(
        'torchvision mapping lands with the general-IS parity work; use the '
        'slim checkpoint converter for the fine-tuned IS model.')


def random_inception_variables(rng, num_classes: int = 1000):
    """Random variables for smoke tests (scores NOT comparable)."""
    import jax
    import jax.numpy as jnp
    from ..models.inception_v3 import InceptionV3

    model = InceptionV3(num_classes=num_classes)
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    return model.init({'params': rng}, x)
