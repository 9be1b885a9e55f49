"""Native async PNG writer (native/imagewriter.cpp) and its wiring into
save_single_images. Reference behavior being matched: the per-sample PNG
dump of the offline protocol (cub_trainer_splitz_cap_ca.py:758-774)."""

import os

import numpy as np
import pytest
from PIL import Image

from text2img_ekl_tpu.io_utils import images as images_mod

try:
    from text2img_ekl_tpu.io_utils import native_writer
    native_writer.get_lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason='native writer unavailable')


@needs_native
def test_write_png_batch_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (7, 32, 48, 3), dtype=np.uint8)
    paths = [str(tmp_path / ('im%d.png' % i)) for i in range(7)]
    native_writer.write_png_batch(imgs, paths)
    assert native_writer.flush() == 0
    back = np.stack([np.asarray(Image.open(p)) for p in paths])
    np.testing.assert_array_equal(back, imgs)


@needs_native
def test_write_png_batch_grayscale_and_errors(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 16, 16), dtype=np.uint8)
    ok = str(tmp_path / 'g.png')
    bad = str(tmp_path / 'no_such_dir' / 'g.png')  # enqueue fails at write
    native_writer.write_png_batch(imgs, [ok, bad])
    assert native_writer.flush() == 1  # exactly the unwritable path
    np.testing.assert_array_equal(np.asarray(Image.open(ok)), imgs[0])
    assert native_writer.flush() == 0  # error count was consumed


def _roundtrip_single_images(tmp_path, env_value):
    """save_single_images -> read back; returns decoded pixels."""
    rng = np.random.default_rng(2)
    images = rng.uniform(-1, 1, (3, 24, 24, 3)).astype(np.float32)
    keys = ['birds/a', 'birds/b', 'birds/c']
    save_dir = str(tmp_path / env_value)
    old = os.environ.get('T2I_NATIVE_WRITE')
    os.environ['T2I_NATIVE_WRITE'] = env_value
    try:
        images_mod.save_single_images(images, keys, save_dir, 'test',
                                      sentence_id=4, classes=[9, 8, 7],
                                      imsize=24, noise_id=1)
        assert images_mod.flush_writes() == 0
    finally:
        if old is None:
            os.environ.pop('T2I_NATIVE_WRITE', None)
        else:
            os.environ['T2I_NATIVE_WRITE'] = old
    paths = ['%s/single_samples/%s_24_class%d_sid4_nid1.png'
             % (save_dir, k, c) for k, c in zip(keys, [9, 8, 7])]
    for p in paths:
        assert os.path.exists(p), p
    return np.stack([np.asarray(Image.open(p)) for p in paths])


@needs_native
def test_save_single_images_native_matches_pil(tmp_path):
    """The native path and the PIL fallback write identical pixels under
    the reference filename scheme."""
    native = _roundtrip_single_images(tmp_path, '1')
    pil = _roundtrip_single_images(tmp_path, '0')
    np.testing.assert_array_equal(native, pil)


def test_save_single_images_pil_fallback(tmp_path):
    """T2I_NATIVE_WRITE=0 must work with no native lib at all."""
    out = _roundtrip_single_images(tmp_path, '0')
    assert out.shape == (3, 24, 24, 3)


def test_save_single_images_uint8_passthrough(tmp_path):
    """uint8 input (device-quantized by the eval loop) is written as-is;
    float input quantizes to the same pixels."""
    rng = np.random.default_rng(3)
    floats = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    quant = np.clip((floats + 1.0) / 2.0 * 255.0, 0, 255).astype(np.uint8)
    old = os.environ.get('T2I_NATIVE_WRITE')
    os.environ['T2I_NATIVE_WRITE'] = '0'
    try:
        for sub, imgs in [('f', floats), ('q', quant)]:
            images_mod.save_single_images(
                imgs, ['a', 'b'], str(tmp_path / sub), 'test',
                sentence_id=0, classes=[1, 2], imsize=16, noise_id=0)
    finally:
        if old is None:
            os.environ.pop('T2I_NATIVE_WRITE', None)
        else:
            os.environ['T2I_NATIVE_WRITE'] = old
    for k, c in zip(['a', 'b'], [1, 2]):
        pf = '%s/f/single_samples/%s_16_class%d_sid0_nid0.png' % (tmp_path, k, c)
        pq = '%s/q/single_samples/%s_16_class%d_sid0_nid0.png' % (tmp_path, k, c)
        np.testing.assert_array_equal(np.asarray(Image.open(pf)),
                                      np.asarray(Image.open(pq)))
