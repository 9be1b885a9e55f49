"""Slim-checkpoint converter exercised against a REAL checkpoint file.

Fabricates a TF checkpoint in the exact format the fine-tuned 50+1-class IS
model ships in — TF1-Saver variables named by the vendored slim tower's
scopes (inception/slim/inception_model.py:87-330), with
ExponentialMovingAverage shadow variables the reference restore prefers
(inception_score.py:247-251) — then round-trips it through
``load_slim_checkpoint`` + ``slim_vars_to_flax`` and asserts the converted
tower reproduces a tf.keras InceptionV3's outputs to 1e-4.

The checkpoint's variable names are generated from a HAND-DERIVED table of
the slim scopes (independent of the converter's own name mapping), so a
drift in ``_flax_path_to_slim`` fails here instead of on the real file.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import flax  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from text2img_ekl_tpu.eval.convert_tf import (  # noqa: E402
    _ordered_convbn_paths, keras_inception_to_flax, load_slim_checkpoint,
    random_inception_variables, slim_vars_to_flax)

NUM_CLASSES = 51  # 50 + background, inception_score.py:229


def _slim_conv_scopes():
    """The slim tower's conv scopes in definition order — transcribed BY
    HAND from inception/slim/inception_model.py:87-330 (stem convs pass
    their name as the conv2d scope; branch convs live in one
    variable_scope per branch, so TF uniquifies Conv/Conv_1/Conv_2...).
    Order matches convert_tf._ordered_convbn_paths."""
    stem = ['conv0', 'conv1', 'conv2', 'conv3', 'conv4']
    m35 = ['branch1x1/Conv', 'branch5x5/Conv', 'branch5x5/Conv_1',
           'branch3x3dbl/Conv', 'branch3x3dbl/Conv_1', 'branch3x3dbl/Conv_2',
           'branch_pool/Conv']
    m17r = ['branch3x3/Conv', 'branch3x3dbl/Conv', 'branch3x3dbl/Conv_1',
            'branch3x3dbl/Conv_2']
    m17 = ['branch1x1/Conv', 'branch7x7/Conv', 'branch7x7/Conv_1',
           'branch7x7/Conv_2', 'branch7x7dbl/Conv', 'branch7x7dbl/Conv_1',
           'branch7x7dbl/Conv_2', 'branch7x7dbl/Conv_3',
           'branch7x7dbl/Conv_4', 'branch_pool/Conv']
    m8r = ['branch3x3/Conv', 'branch3x3/Conv_1', 'branch7x7x3/Conv',
           'branch7x7x3/Conv_1', 'branch7x7x3/Conv_2', 'branch7x7x3/Conv_3']
    m8 = ['branch1x1/Conv', 'branch3x3/Conv', 'branch3x3/Conv_1',
          'branch3x3/Conv_2', 'branch3x3dbl/Conv', 'branch3x3dbl/Conv_1',
          'branch3x3dbl/Conv_2', 'branch3x3dbl/Conv_3', 'branch_pool/Conv']
    # NOTE the 17->8 reduction block is scoped mixed_17x17x1280a in slim
    # (inception_model.py:266) although its output grid is 8x8.
    blocks = [('mixed_35x35x256a', m35), ('mixed_35x35x288a', m35),
              ('mixed_35x35x288b', m35), ('mixed_17x17x768a', m17r),
              ('mixed_17x17x768b', m17), ('mixed_17x17x768c', m17),
              ('mixed_17x17x768d', m17), ('mixed_17x17x768e', m17),
              ('mixed_17x17x1280a', m8r), ('mixed_8x8x2048a', m8),
              ('mixed_8x8x2048b', m8)]
    out = list(stem)
    for blk, items in blocks:
        out += ['%s/%s' % (blk, s) for s in items]
    return out


@pytest.fixture(scope='module')
def roundtrip(tmp_path_factory):
    tf.random.set_seed(0)
    keras_model = tf.keras.applications.InceptionV3(
        weights=None, include_top=True, classes=NUM_CLASSES)
    donor = keras_inception_to_flax(
        keras_model,
        random_inception_variables(jax.random.PRNGKey(0), NUM_CLASSES,
                                   'slim'))
    flat = flax.traverse_util.flatten_dict(donor)

    # --- fabricate the checkpoint with real slim names -----------------
    entries = {}

    def put(name, value, ema=False):
        """Trainable vars: raw slot holds garbage, the EMA shadow holds the
        real value — exactly what variables_to_restore() reads back."""
        value = np.asarray(value, np.float32)
        if ema:
            entries[name] = np.zeros_like(value)
            entries[name + '/ExponentialMovingAverage'] = value
        else:
            entries[name] = value

    for scope, path in zip(_slim_conv_scopes(), _ordered_convbn_paths()):
        p = tuple(path.split('/'))
        put(scope + '/weights', flat[('params',) + p + ('Conv_0', 'kernel')],
            ema=True)
        put(scope + '/BatchNorm/beta',
            flat[('params',) + p + ('BatchNorm_0', 'bias')], ema=True)
        put(scope + '/BatchNorm/moving_mean',
            flat[('batch_stats',) + p + ('BatchNorm_0', 'mean')])
        put(scope + '/BatchNorm/moving_variance',
            flat[('batch_stats',) + p + ('BatchNorm_0', 'var')])
    put('logits/logits/weights', flat[('params', 'logits', 'kernel')],
        ema=True)
    put('logits/logits/biases', flat[('params', 'logits', 'bias')], ema=True)

    ckpt_path = str(tmp_path_factory.mktemp('slim_ckpt') / 'model.ckpt')
    with tf.Graph().as_default():
        var_list = {}
        for i, (name, val) in enumerate(entries.items()):
            var_list[name] = tf.Variable(val, name='v%d' % i)
        saver = tf.compat.v1.train.Saver(var_list=var_list)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, ckpt_path)

    return keras_model, ckpt_path


def test_load_slim_checkpoint_prefers_ema(roundtrip):
    _, ckpt_path = roundtrip
    loaded = load_slim_checkpoint(ckpt_path, NUM_CLASSES)
    # raw slots were zero-filled; the EMA shadows carry the real weights
    assert not np.allclose(loaded['conv0/weights'], 0.0)
    assert not np.allclose(loaded['logits/logits/weights'], 0.0)
    # moving stats come through under their own names
    assert 'conv0/BatchNorm/moving_mean' in loaded
    assert float(np.mean(loaded['conv0/BatchNorm/moving_variance'])) >= 0


def test_converted_tower_matches_keras(roundtrip):
    """End-to-end: checkpoint file -> loader -> name mapping -> our tower
    reproduces the keras outputs (the reference metric stack's semantics,
    inception_score.py:227-251)."""
    keras_model, ckpt_path = roundtrip
    from text2img_ekl_tpu.models.inception_v3 import make_inception

    fresh = random_inception_variables(jax.random.PRNGKey(7), NUM_CLASSES,
                                       'slim')
    converted = slim_vars_to_flax(
        load_slim_checkpoint(ckpt_path, NUM_CLASSES), fresh)

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    ref = keras_model(x, training=False).numpy()  # softmax over 51
    model = make_inception(NUM_CLASSES, 'slim')
    logits, _ = jax.jit(model.apply)(converted, jnp.asarray(x))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(probs, ref, atol=1e-4, rtol=1e-3)


def test_load_frozen_graph_weights(tmp_path):
    """Const extraction from a frozen GraphDef pb (the 2015 ImageNet graph
    format fid.py:190-206 / inception_score_general.py:56-71 load)."""
    tf = pytest.importorskip('tensorflow')
    from text2img_ekl_tpu.eval.convert_tf import load_frozen_graph_weights

    g = tf.compat.v1.GraphDef()
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    n = g.node.add()
    n.name, n.op = 'conv/weights', 'Const'
    n.attr['value'].tensor.CopyFrom(tf.make_tensor_proto(w))
    n2 = g.node.add()
    n2.name, n2.op = 'input', 'Placeholder'  # non-Const: skipped
    pb = tmp_path / 'graph.pb'
    pb.write_bytes(g.SerializeToString())

    out = load_frozen_graph_weights(str(pb))
    assert set(out) == {'conv/weights', '__scale_after_normalization__'}
    # no BatchNormWithGlobalNormalization nodes -> gamma applies by default
    assert bool(out['__scale_after_normalization__']) is True
    np.testing.assert_array_equal(out['conv/weights'], w)
