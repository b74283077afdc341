"""ctypes bindings for the native C++ loader (`native/loader.cpp`).

Threaded JPEG decode + bilinear resize and MJPEG-AVI frame extraction without
the Python GIL — the TPU-native replacement for the reference's torch
DataLoader worker processes. Falls back gracefully when the shared library
has not been built (``make -C native``).
"""

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB = None
_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATHS = [p for p in [
    os.environ.get("CCVS_TPU_NATIVE_LIB"),           # explicit override
    os.path.join(os.path.dirname(_PKG_DIR), "native", "libccvs_loader.so"),  # repo checkout
    os.path.join(_PKG_DIR, "libccvs_loader.so"),      # installed alongside the package
    "libccvs_loader.so",                              # system search path
] if p]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        lib.ccvs_decode_jpeg_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)
        ]
        lib.ccvs_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.ccvs_avi_frame_count.argtypes = [ctypes.c_char_p]
        lib.ccvs_avi_decode_frames.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _LIB = lib
        return lib
    return None


def available() -> bool:
    return _load() is not None


def decode_jpeg_batch(paths: Sequence[str], height: int, width: int,
                      n_threads: int = 8) -> Optional[np.ndarray]:
    """Decode+resize a batch of JPEG files -> (N, H, W, 3) uint8."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    r = lib.ccvs_decode_jpeg_batch(
        arr, n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    if r != 0:
        return None
    return out


def avi_frame_count(path: str) -> int:
    lib = _load()
    if lib is None:
        return -1
    return lib.ccvs_avi_frame_count(path.encode())


def avi_decode_frames(path: str, indices: Sequence[int], height: int, width: int,
                      n_threads: int = 8) -> Optional[np.ndarray]:
    """Decode selected frames of an MJPEG AVI -> (N, H, W, 3) uint8."""
    lib = _load()
    if lib is None:
        return None
    n = len(indices)
    out = np.empty((n, height, width, 3), np.uint8)
    idx = (ctypes.c_int * n)(*indices)
    r = lib.ccvs_avi_decode_frames(
        path.encode(), idx, n, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads,
    )
    if r != 0:
        return None
    return out
