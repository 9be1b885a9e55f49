"""Image grid / sample savers.

Numpy equivalents of the torchvision vutils calls the reference makes:
``make_grid``/``save_image`` per-epoch grids (cub_trainer_splitz_cap_ca.py:
231-264) and the single-sample saver with the reference's filename scheme
'%s_%d_class%d_sid%d_nid%d.png' (cub_trainer_splitz_cap_ca.py:758-774).
Inputs are NHWC float in [-1, 1].
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image


def pm1_to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] floats -> uint8 pixels. THE host-side quantization; the
    device-side twin is train/step.py:_pm1_to_uint8_dev (parity asserted
    by tests/test_train_step.py::test_caption_sampler_matches_looped_calls
    and tests/test_native_writer.py) — change both together."""
    return np.clip((np.asarray(x) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def _to_uint8(img: np.ndarray, normalize: bool = True) -> np.ndarray:
    if img.dtype == np.uint8:
        # already-quantized pixels (uint8 input-pipeline batches)
        return img
    if normalize:
        lo, hi = img.min(), img.max()
        if hi > lo:
            img = (img - lo) / (hi - lo)
        else:
            img = np.zeros_like(img)
    else:
        img = (img + 1.0) / 2.0
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8,
              padding: int = 2) -> np.ndarray:
    """[N, H, W, C] -> grid [gh, gw, C] uint8-ready float, vutils-style."""
    n, h, w, c = images.shape
    ncols = min(nrow, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.zeros((nrows * (h + padding) + padding,
                     ncols * (w + padding) + padding, c),
                    dtype=images.dtype)
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[idx]
    return grid


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8,
                    normalize: bool = True) -> None:
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    grid = make_grid(np.asarray(images), nrow)
    Image.fromarray(_to_uint8(grid, normalize)).save(path)


def save_single_images(images: np.ndarray, filenames: Sequence[str],
                       save_dir: str, split_dir: str, sentence_id: int,
                       classes: Sequence[int], imsize: int,
                       noise_id: int) -> None:
    """Reference naming: <dir>/single_samples/<key>_<imsize>_class<c>_
    sid<s>_nid<n>.png (cub_trainer_splitz_cap_ca.py:758-774).

    The encode goes through the native async PNG writer when available
    (C++ thread pool off the GIL, overlapped with device sampling —
    native/imagewriter.cpp); callers that read the files back must call
    ``flush_writes()`` first. PIL fallback is synchronous.
    """
    paths = []
    for i in range(images.shape[0]):
        s_tmp = '%s/single_samples/%s' % (save_dir, filenames[i])
        folder = s_tmp[:s_tmp.rfind('/')]
        os.makedirs(folder, exist_ok=True)
        paths.append('%s_%d_class%d_sid%d_nid%d.png' % (
            s_tmp, imsize, int(classes[i]), sentence_id, noise_id))
    batch = np.asarray(images)
    if batch.dtype != np.uint8:
        # [-1,1] floats; uint8 input means the caller already quantized
        # (the eval loop quantizes on device to shrink the D2H transfer)
        batch = pm1_to_uint8(batch)
    if os.environ.get('T2I_NATIVE_WRITE', '1') == '1':
        try:
            from .native_writer import write_png_batch
            write_png_batch(batch, paths)
            return
        except Exception:
            pass  # fall through to PIL
    for img, fullpath in zip(batch, paths):
        Image.fromarray(img).save(fullpath)


def flush_writes() -> int:
    """Join the async PNG writer; returns the failed-write count (0 when
    the native writer was never used)."""
    try:
        from . import native_writer
    except Exception:
        return 0
    return native_writer.flush()


def save_super_images(images_list, filenames: Sequence[str], save_dir: str,
                      split_dir: str, imsize: int) -> None:
    """10-caption super grids (cub_trainer_splitz_cap_ca.py:734-756)."""
    batch_size = images_list[0].shape[0]
    for i in range(batch_size):
        s_tmp = '%s/super/%s/%s' % (save_dir, split_dir, filenames[i])
        folder = s_tmp[:s_tmp.rfind('/')]
        os.makedirs(folder, exist_ok=True)
        rows = np.stack([imgs[i] for imgs in images_list])
        save_image_grid(rows, '%s_%d.png' % (s_tmp, imsize), nrow=10)
