"""Native runtime components (C++ via ctypes).

The reference's runtime leans on native code where it matters (CUDA
rasterizer, C++ triangle walk, forked torch DataLoader workers). The TPU
compute path here is Pallas/XLA; this package holds the HOST-side native
pieces — currently the threaded image decode/resize loader that replaces
the reference's PIL-in-forked-workers input pipeline.

The shared library builds lazily on first import (g++, links libpng/libjpeg)
and everything degrades gracefully to the PIL path when a toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libfaloader.so")
_SRC = os.path.join(_HERE, "loader.cc")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
        "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_loader():
    """The ctypes handle, building on demand. None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.fa_decode_image.restype = ctypes.c_int
        lib.fa_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fa_decode_batch.restype = ctypes.c_int
        lib.fa_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_loader() is not None


def decode_image(path: str, width: int, height: int):
    """Decode + resize one image -> (rgba float32 [h, w, 4], src_channels).
    Returns None on failure (caller falls back to PIL)."""
    lib = get_loader()
    if lib is None:
        return None
    out = np.empty((height, width, 4), np.float32)
    c = lib.fa_decode_image(
        path.encode(), width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if c < 0:
        return None
    return out, int(c)


def decode_batch(paths, width: int, height: int, nthreads: int = 8):
    """Threaded batch decode -> (rgba [n, h, w, 4], channels [n])."""
    lib = get_loader()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 4), np.float32)
    channels = np.empty((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fa_decode_batch(
        arr, n, width, height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        channels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        nthreads,
    )
    return out, channels
