"""ctypes binding to the native texture loader (libflowgen_host.so).

The shared library decodes and resizes texture databases with a C++ thread
pool — the native-quality counterpart of the reference's startup texture load
(TextureCollection ctor, src/caffe/DataGenerator.cpp:117-149). Built via
``make -C flowgen/texture_io/native``; loading degrades gracefully to the PIL
path when the library is absent or a format is unsupported.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libflowgen_host.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # Build on first use (g++ is part of the toolchain); stay silent on
        # failure — the pure-Python decode path takes over.
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(__file__)],
                capture_output=True, timeout=120, check=False,
            )
        except Exception:
            pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fg_load_images.restype = ctypes.c_int
        lib.fg_load_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,                     # n paths
            ctypes.c_int,                     # out_h
            ctypes.c_int,                     # out_w
            ctypes.POINTER(ctypes.c_ubyte),   # out buffer (n, h, w, 3)
            ctypes.c_int,                     # n threads
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_loader_available() -> bool:
    return _load() is not None


def load_images_native(paths: List[str], out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Returns the packed (N, out_h, out_w, 3) uint8 atlas, or None if the
    native loader can't handle the inputs (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = min(16, max(1, os.cpu_count() or 1))
    rc = lib.fg_load_images(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), threads,
    )
    if rc != 0:
        return None
    return out
