"""ctypes binding for the native async PNG writer (native/imagewriter.cpp).

The offline sampling protocol writes one PNG per (image, caption, noise)
triple — 30k files at TEST.SAMPLE_NUM (reference
cub_trainer_splitz_cap_ca.py:758-774, miscc/config.py:32) — and the
reference does it synchronously through PIL inside the sampling loop.
Here the encode runs on a C++ thread pool off the GIL, overlapped with
device sampling; ``flush()`` joins before the directory is consumed.

Builds the shared library on first use (g++ + libpng) and caches it next
to the source. Callers catch ``NativeUnavailable`` and fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_SRC = os.path.join(_NATIVE_DIR, 'imagewriter.cpp')
_SO = os.path.join(_NATIVE_DIR, 'libt2i_imagewriter.so')

_lock = threading.Lock()
_lib = None
_writer = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           _SRC, '-o', _SO, '-lpng', '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        raise NativeUnavailable(
            'native writer build failed: %s' % getattr(e, 'stderr', str(e)))
    return _SO


def get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _SO
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            so = _build()
        lib = ctypes.CDLL(so)
        lib.t2i_writer_create.restype = ctypes.c_void_p
        lib.t2i_writer_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.t2i_writer_destroy.argtypes = [ctypes.c_void_p]
        lib.t2i_write_png_batch.restype = ctypes.c_int
        lib.t2i_write_png_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.t2i_writer_flush.restype = ctypes.c_int
        lib.t2i_writer_flush.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def _get_writer():
    """Process-wide writer singleton (thread pool sized by env)."""
    global _writer
    with _lock:
        if _writer is None:
            lib = _lib  # get_lib() was already called by the public entry
            threads = int(os.environ.get(
                'T2I_WRITER_THREADS', min(4, os.cpu_count() or 1)))
            # zlib level 1 (still lossless): 2.3x faster 256px protocol
            # writes than PIL's default 6 (PERF.md); the files are
            # transient IS/FID inputs, size is secondary
            level = int(os.environ.get('T2I_PNG_LEVEL', 1))
            _writer = ctypes.c_void_p(lib.t2i_writer_create(threads, level))
        return _writer


def write_png_batch(images: np.ndarray, paths: Sequence[str]) -> None:
    """Asynchronously write ``images[i]`` (HWC uint8) to ``paths[i]``.

    Returns as soon as the batch is enqueued (one internal copy); call
    ``flush()`` before reading the files back.
    """
    lib = get_lib()
    images = np.ascontiguousarray(images, dtype=np.uint8)
    if images.ndim == 3:
        images = images[..., None]
    n, h, w, c = images.shape
    if len(paths) != n:
        raise ValueError('got %d paths for %d images' % (len(paths), n))
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.t2i_write_png_batch(
        _get_writer(), n, arr,
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c)
    if rc != 0:
        raise NativeUnavailable('t2i_write_png_batch rc=%d' % rc)


def flush() -> int:
    """Block until every queued write finished; return the error count."""
    if _writer is None:
        return 0
    return get_lib().t2i_writer_flush(_writer)
