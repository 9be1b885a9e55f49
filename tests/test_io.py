"""Checkpoint round-trip, image savers, metrics logging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2img_ekl_tpu.io_utils import (
    CheckpointManager, MetricsLogger, make_grid, save_image_grid,
    save_single_images)
from text2img_ekl_tpu.io_utils.checkpoint import parse_epoch_from_path


def test_parse_epoch_from_path():
    assert parse_epoch_from_path('Model/netG_epoch123') == 124
    assert parse_epoch_from_path('Model/netG_210000.pth') == 210001
    assert parse_epoch_from_path('Model/netG') == 0


def test_checkpoint_roundtrip(tmp_path):
    import flax

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray
        w: jnp.ndarray

    mgr = CheckpointManager(str(tmp_path / 'Model'))
    s = S(step=jnp.asarray(5), w=jnp.arange(6.0).reshape(2, 3))
    p = mgr.save(s, epoch=5)
    assert os.path.exists(p)
    restored = mgr.restore(S(step=jnp.asarray(0), w=jnp.zeros((2, 3))))
    assert int(restored.step) == 5
    np.testing.assert_allclose(np.asarray(restored.w), np.asarray(s.w))


def test_checkpoint_latest_picks_highest_epoch(tmp_path):
    import flax

    @flax.struct.dataclass
    class S:
        step: jnp.ndarray

    mgr = CheckpointManager(str(tmp_path / 'Model'))
    for e in [1, 9, 4]:
        mgr.save(S(step=jnp.asarray(e)), epoch=e)
    assert mgr.latest().endswith('state_epoch9')


def test_make_grid_layout():
    imgs = np.zeros((5, 8, 8, 3), np.float32)
    grid = make_grid(imgs, nrow=4, padding=2)
    # 2 rows x 4 cols
    assert grid.shape == (2 * 10 + 2, 4 * 10 + 2, 3)


def test_save_image_grid(tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)) \
        .astype(np.float32)
    p = str(tmp_path / 'grid.png')
    save_image_grid(imgs, p)
    from PIL import Image
    im = Image.open(p)
    assert im.size[0] > 16


def test_save_single_images_naming(tmp_path):
    imgs = np.zeros((2, 8, 8, 3), np.float32)
    save_single_images(imgs, ['cls1/a', 'cls2/b'], str(tmp_path), 'test',
                       sentence_id=3, classes=[7, 9], imsize=8, noise_id=1)
    expected = tmp_path / 'single_samples' / 'cls1' / \
        'a_8_class7_sid3_nid1.png'
    assert expected.exists()


def test_metrics_logger_jsonl(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log_scalars(10, {'a': 1.5, 'b': 2})
    lg.log_scalars(20, {'a': 2.5})
    lg.close()
    lines = [json.loads(l) for l in
             open(tmp_path / 'metrics.jsonl').read().splitlines()]
    assert lines[0]['step'] == 10 and lines[0]['a'] == 1.5
    assert lines[1]['step'] == 20


def test_save_super_images(tmp_path):
    """10-caption super grids under super/<split>/ with the reference's
    naming (cub_trainer_splitz_cap_ca.py:734-756)."""
    from text2img_ekl_tpu.io_utils.images import save_super_images
    rng = np.random.default_rng(0)
    # 10 captions x batch of 2, 16px images in [-1, 1]
    images_list = [rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
                   for _ in range(10)]
    save_super_images(images_list, ['birds/a', 'birds/b'], str(tmp_path),
                      'test', 16)
    for name in ('a', 'b'):
        p = tmp_path / 'super' / 'test' / 'birds' / f'{name}_16.png'
        assert p.is_file()
        from PIL import Image
        im = Image.open(p)
        assert im.size[0] >= 16 * 10  # 10 per row
