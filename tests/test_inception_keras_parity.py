"""InceptionV3 golden parity vs tf.keras — an independent implementation.

Converts a randomly-initialized tf.keras.applications.InceptionV3 into our
flax tree (TF flavor: BN without scale, border-exclusive avg pools) and
matches pool_3 and class probabilities end-to-end. This validates the whole
metrics tower — architecture, padding, pooling and BN semantics — without
the released checkpoint files (SURVEY.md section 7 "hard part 1").
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from text2img_ekl_tpu.eval.convert_tf import keras_inception_to_flax  # noqa: E402
from text2img_ekl_tpu.models.inception_v3 import InceptionV3  # noqa: E402


@pytest.fixture(scope='module')
def models():
    tf.random.set_seed(0)
    keras_model = tf.keras.applications.InceptionV3(
        weights=None, include_top=True, classes=1000)
    m = InceptionV3(num_classes=1000, bn_scale=False, torch_pool=False)
    variables = jax.jit(m.init)({'params': jax.random.PRNGKey(0)},
                                jnp.zeros((1, 299, 299, 3)))
    variables = keras_inception_to_flax(keras_model, variables)
    return keras_model, m, variables


def test_probabilities_match_keras(models):
    keras_model, m, variables = models
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    ref = keras_model(x, training=False).numpy()  # softmax output
    logits, _ = jax.jit(m.apply)(variables, jnp.asarray(x))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(probs, ref, atol=1e-4, rtol=1e-3)


def test_pool3_matches_keras(models):
    keras_model, m, variables = models
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    feat_model = tf.keras.Model(
        keras_model.input,
        keras_model.get_layer('avg_pool').output)
    ref = feat_model(x, training=False).numpy()
    _, ep = jax.jit(m.apply)(variables, jnp.asarray(x))
    got = np.asarray(ep['pool_3'])
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
    # and the relative error is tiny in aggregate
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 1e-4, rel
