"""InceptionV3 parity vs torchvision (offline golden test).

The reference's general-IS path runs torchvision's inception_v3
(model.py:18-47). Converting a randomly-initialized torchvision state dict
into our flax tree and matching activations end-to-end validates the whole
tower (architecture + padding + pooling + BN semantics) without needing the
released checkpoint files — the strongest parity evidence available
offline (SURVEY.md section 7 "hard part 1").
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
torchvision = pytest.importorskip('torchvision')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from text2img_ekl_tpu.eval.convert_tf import torchvision_state_to_flax  # noqa: E402
from text2img_ekl_tpu.models.inception_v3 import InceptionV3  # noqa: E402


@pytest.fixture(scope='module')
def models():
    tv = torchvision.models.inception_v3(
        weights=None, aux_logits=True, init_weights=True,
        transform_input=False)
    tv.eval()
    m = InceptionV3(num_classes=1000, bn_scale=True)
    variables = jax.jit(m.init)({'params': jax.random.PRNGKey(0)},
                                jnp.zeros((1, 299, 299, 3)))
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    variables = torchvision_state_to_flax(sd, variables)
    return tv, m, variables


def test_logits_match_torchvision(models):
    tv, m, variables = models
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tv(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    logits, ep = jax.jit(m.apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=1e-3)


def test_pool3_matches_torchvision(models):
    tv, m, variables = models
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    # torchvision pool3: forward up to avgpool + flatten
    with torch.no_grad():
        t = torch.tensor(x.transpose(0, 3, 1, 2))
        feats = torch.flatten(torch.nn.functional.adaptive_avg_pool2d(
            _tv_features(tv, t), (1, 1)), 1).numpy()
    _, ep = jax.jit(m.apply)(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ep['pool_3']), feats,
                               atol=2e-3, rtol=1e-3)


def _tv_features(tv, x):
    x = tv.Conv2d_1a_3x3(x)
    x = tv.Conv2d_2a_3x3(x)
    x = tv.Conv2d_2b_3x3(x)
    x = tv.maxpool1(x)
    x = tv.Conv2d_3b_1x1(x)
    x = tv.Conv2d_4a_3x3(x)
    x = tv.maxpool2(x)
    x = tv.Mixed_5b(x)
    x = tv.Mixed_5c(x)
    x = tv.Mixed_5d(x)
    x = tv.Mixed_6a(x)
    x = tv.Mixed_6b(x)
    x = tv.Mixed_6c(x)
    x = tv.Mixed_6d(x)
    x = tv.Mixed_6e(x)
    x = tv.Mixed_7a(x)
    x = tv.Mixed_7b(x)
    x = tv.Mixed_7c(x)
    return x
