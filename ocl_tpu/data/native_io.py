"""ctypes bridge to the native data-loader (csrc/dataio.cpp).

Builds the shared library on first use (g++ + libjpeg, both in the image) and
exposes `decode_jpeg_batch(paths, h, w)`. Callers fall back to PIL when the
toolchain or library is unavailable, so the framework stays pure-Python
capable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_libocl_dataio.so")


def _src_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "csrc", "dataio.cpp")


def build_library(force: bool = False) -> str | None:
    """Compile csrc/dataio.cpp -> ocl_tpu/data/_libocl_dataio.so."""
    out = _lib_path()
    src = _src_path()
    if os.path.exists(out) and not force:
        if not os.path.exists(src) or os.path.getmtime(out) >= os.path.getmtime(src):
            return out
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", out, src,
             "-ljpeg", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return out
    except Exception:
        return None


def get_library():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.decode_jpeg_batch.restype = ctypes.c_int
    lib.decode_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    _LIB = lib
    return _LIB


def decode_jpeg_batch(paths, h: int, w: int, n_threads: int | None = None):
    """uint8 [n, h, w, 3] decoded with the native thread pool, or None if the
    native loader is unavailable / any file has unexpected geometry."""
    lib = get_library()
    if lib is None or not paths:
        return None
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    threads = n_threads or min(8, os.cpu_count() or 1)
    failures = lib.decode_jpeg_batch(
        c_paths, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), threads)
    if failures:
        return None
    return out
