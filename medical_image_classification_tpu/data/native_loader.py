"""ctypes bindings to the native C++ batch decoder (native/decode.cpp).

The ctypes call releases the GIL, so the C++ thread pool overlaps decode
with the TPU step.  Built on demand with g++ (no pip deps); falls back to
the OpenCV loader when the toolchain or libs are missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _build_lib() -> Optional[str]:
    so = os.path.join(_NATIVE_DIR, "libmicdecode.so")
    src = os.path.join(_NATIVE_DIR, "decode.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", so, src, "-ljpeg", "-lpng", "-lpthread"],
            check=True, capture_output=True, cwd=_NATIVE_DIR)
        return so
    except Exception:
        return None


def get_lib():
    """Returns the loaded library or None if unavailable."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        so = _build_lib()
        if so is None:
            _LIB = False
            return None
        lib = ctypes.CDLL(so)
        lib.mic_decode_batch.restype = ctypes.c_int
        lib.mic_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_ulonglong,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ]
        _LIB = lib
        return lib


def native_available() -> bool:
    return get_lib() is not None


def decode_batch(paths: List[str], out_size: int, train: bool,
                 seed: int, threads: int = 8) -> np.ndarray:
    """Decode + augment a batch natively. Returns uint8 [N, S, S, 3]."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.mic_decode_batch(
        arr, n, out_size, int(train), ctypes.c_ulonglong(seed & (2**64 - 1)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), threads)
    if failures:
        import warnings
        warnings.warn(f"native decoder: {failures}/{n} images failed "
                      "(slots zeroed)")
    return out
