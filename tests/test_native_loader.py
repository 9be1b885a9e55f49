"""Native C++ decoder tests: build, decode, parity with the PIL path."""

import os

import numpy as np
import pytest
from PIL import Image

pytest.importorskip('ctypes')


@pytest.fixture(scope='module')
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp('jpegs')
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        arr = rng.integers(0, 255, (90 + i * 7, 120 + i * 5, 3),
                           dtype=np.uint8)
        p = str(d / ('img%d.jpg' % i))
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def _decoder(sizes, **kw):
    from text2img_ekl_tpu.data.native_loader import (
        NativeDecoder, NativeUnavailable)
    try:
        return NativeDecoder(sizes, **kw)
    except NativeUnavailable as e:
        pytest.skip('native loader unavailable: %s' % e)


def test_decode_batch_shapes_and_range(jpegs):
    dec = _decoder([32, 64], num_threads=2)
    outs = dec.decode_batch(jpegs, train=True, seed=1)
    assert outs[0].shape == (4, 32, 32, 3)
    assert outs[1].shape == (4, 64, 64, 3)
    for o in outs:
        assert o.min() >= -1.0 and o.max() <= 1.0
        assert np.abs(o).sum() > 0  # actually decoded something


def test_decode_deterministic_given_seed(jpegs):
    dec = _decoder([32, 64], num_threads=2)
    a = dec.decode_batch(jpegs, train=True, seed=7)
    b = dec.decode_batch(jpegs, train=True, seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = dec.decode_batch(jpegs, train=True, seed=8)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_eval_mode_center_crop_close_to_pil(jpegs):
    """Eval path (no randomness): native pipeline should be within resize
    tolerance of the PIL implementation."""
    from text2img_ekl_tpu.data.transforms import (
        build_eval_transform, multiscale_pyramid)
    dec = _decoder([32, 64], num_threads=1)
    outs = dec.decode_batch(jpegs[:1], train=False, seed=0)
    t = build_eval_transform(64)
    img = t(Image.open(jpegs[0]).convert('RGB'))
    ref = multiscale_pyramid(img, [32, 64])
    # bilinear implementations differ slightly; mean abs diff must be small
    diff = np.abs(outs[1][0] - ref[1]).mean()
    assert diff < 0.1, diff


def test_missing_file_zero_filled(jpegs):
    dec = _decoder([32], num_threads=1)
    outs = dec.decode_batch([jpegs[0], '/nonexistent/x.jpg'], train=False)
    assert np.abs(outs[0][0]).sum() > 0
    assert np.abs(outs[0][1]).sum() == 0


def test_bbox_crop_changes_output(jpegs):
    dec = _decoder([32], num_threads=1)
    no_bb = dec.decode_batch(jpegs[:1], train=False)
    bb = np.array([[10, 10, 40, 40]], np.float32)
    with_bb = dec.decode_batch(jpegs[:1], bboxes=bb, train=False)
    assert not np.array_equal(no_bb[0], with_bb[0])
