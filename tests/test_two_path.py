"""Two-path sampling tests (reference trainer.py:711-838 flow)."""

import glob
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.config import cfg_from_file
from text2img_ekl_tpu.train.two_path import (
    init_two_path_variables, two_path_sample)

REF = '/root/reference/cfg/coco_2stgs.yml'


@pytest.fixture(scope='module')
def nets():
    cfg = cfg_from_file(REF)
    cfg.GAN.GF_DIM = 8
    cfg.TPU_COMPUTE_DTYPE = 'float32'
    return cfg, init_two_path_variables(cfg, jax.random.PRNGKey(0))


def test_two_path_product_decode_shapes(nets):
    cfg, (sen_net, entity_net, sen_vars, ent_vars) = nets
    B = 2
    noise = jnp.zeros((B, cfg.GAN.Z_DIM))
    txt = jnp.zeros((B, cfg.TEXT.DIMENSION))
    cls = jax.nn.one_hot(jnp.array([3, 7]), cfg.GAN.ENTITY_DIM)
    imgs = two_path_sample(sen_net, entity_net, sen_vars, ent_vars,
                           jax.random.PRNGKey(1), noise, txt, cls)
    assert len(imgs) == cfg.TREE.BRANCH_NUM
    assert imgs[-1].shape == (B, cfg.imsize, cfg.imsize, 3)
    arr = np.asarray(imgs[-1])
    assert np.all(np.isfinite(arr)) and arr.min() >= -1 and arr.max() <= 1


TWO_PATH_YML = """\
CONFIG_NAME: 'twopath-cli'
DATASET_NAME: 'coco'
DATA_DIR: ''
WORKERS: 1
TREE:
    BRANCH_NUM: 2
    BASE_SIZE: 32
TRAIN:
    FLAG: False
    NET_G: '{sen}'
    ENTITY_NET_G: '{ent}'
    BATCH_SIZE: 4
GAN:
    EMBEDDING_DIM: 16
    ENTITY_DIM: 90
    MANIFD_DIM: 16
    DF_DIM: 8
    GF_DIM: 8
    Z_DIM: 16
    R_NUM: 1
    B_CONDITION: True
TEXT:
    DIMENSION: 32
TPU_COMPUTE_DTYPE: 'float32'
"""


def test_two_path_cli_end_to_end(tmp_path):
    """A reference-style two-path eval config (TRAIN.FLAG false +
    TRAIN.ENTITY_NET_G set, miscc/config.py:48) run through the real CLI
    must dispatch to the product-of-hcodes sampler (reference
    trainer.py:711-838) and write images — previously main.py silently
    ran the single-path sampler."""
    yml = tmp_path / 'twopath.yml'
    yml.write_text(TWO_PATH_YML.format(sen=tmp_path / 'ckpt_sen',
                                       ent=tmp_path / 'ckpt_ent'))
    cfg = cfg_from_file(str(yml))
    _, _, sen_vars, ent_vars = init_two_path_variables(
        cfg, jax.random.PRNGKey(7))
    from text2img_ekl_tpu.io_utils.checkpoint import save_train_state
    save_train_state(str(tmp_path / 'ckpt_sen'), sen_vars)
    save_train_state(str(tmp_path / 'ckpt_ent'), ent_vars)

    env = dict(os.environ, T2I_PLATFORM='cpu')
    env.setdefault('T2I_JAX_CACHE', str(tmp_path / 'jaxcache'))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'main.py'), '--cfg', str(yml),
         '--synthetic', '--max_steps', '1'],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    pngs = glob.glob(str(tmp_path / 'output' / '**' / '*twopath*' / '**'
                         / '*.png'), recursive=True)
    assert pngs, 'two-path eval wrote no images:\n' + proc.stdout


def test_two_path_decode_is_product_of_hcodes(nets):
    """get_image(e, s) == image(e * s) through the sentence net's heads."""
    cfg, (sen_net, entity_net, sen_vars, ent_vars) = nets
    B = 2
    h1 = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 64, 8))
    h2 = jax.random.normal(jax.random.PRNGKey(1),
                           (B, 128, 128, 8 // cfg.TREE.SCALE))
    a1 = jax.random.normal(jax.random.PRNGKey(2), (B, 64, 64, 8))
    a2 = jax.random.normal(jax.random.PRNGKey(3),
                           (B, 128, 128, 8 // cfg.TREE.SCALE))
    via_get = sen_net.apply(sen_vars, [a1, a2], [h1, h2], method='get_image')
    via_img = sen_net.apply(sen_vars, [a1 * h1, a2 * h2], method='image')
    for x, y in zip(via_get, via_img):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
