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


def _make(force: bool = False):
    # Build on first use (g++ is part of the toolchain); stay silent on
    # failure — the pure-Python decode path takes over.
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)]
            + (["-B"] if force else []),
            capture_output=True, timeout=120, check=False,
        )
    except Exception:
        pass


def _open(path):
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    if not hasattr(lib, "fg_loader_abi_v2"):
        return None  # stale pre-per-file-fallback build
    lib.fg_load_images.restype = ctypes.c_int
    lib.fg_load_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),  # paths
        ctypes.c_int,                     # n paths
        ctypes.c_int,                     # out_h
        ctypes.c_int,                     # out_w
        ctypes.POINTER(ctypes.c_ubyte),   # out buffer (n, h, w, 3)
        ctypes.c_int,                     # n threads
        ctypes.POINTER(ctypes.c_ubyte),   # per-file ok flags (may be NULL)
    ]
    return lib


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        _make()
    _LIB = _open(path) if os.path.exists(path) else None
    if _LIB is None and os.path.exists(path):
        # Present but stale/unloadable: rebuild once. A dlopened library
        # can't be refreshed in-process, so a stale one stays disabled for
        # this process if the rebuild still doesn't expose the v2 ABI.
        _make(force=True)
        _LIB = _open(path)
    return _LIB


def native_loader_available() -> bool:
    return _load() is not None


def load_images_native(
    paths: List[str], out_h: int, out_w: int
) -> Optional[tuple]:
    """Threaded native decode of ``paths`` into a packed (N, out_h, out_w, 3)
    uint8 atlas. Returns ``(atlas, ok)`` where ``ok`` is a per-file bool mask
    (False slots are undecoded — unsupported format, e.g. TIFF —
    and the caller PIL-decodes only those), or None when the shared library
    itself is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = min(16, max(1, os.cpu_count() or 1))
    rc = lib.fg_load_images(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc < 0:
        return None
    return out, ok.astype(bool)
