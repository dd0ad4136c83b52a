"""Native (C++) host-runtime components.

`clipdecode` — libjpeg/libpng frame decoder + bilinear resize + normalize
with an internal pthread pool, loaded via ctypes. Build is on-demand
(g++ -O3 -shared); the Python pipeline falls back to PIL when the
toolchain or libraries are unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "clipdecode.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "libclipdecode.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def build(force: bool = False) -> bool:
    """Compile the shared library if needed. Returns availability."""
    if os.path.exists(_SO) and not force and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    _TRIED = True
    if not build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.decode_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.decode_frames.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def decode_frames(paths: List[str], out_size: int, mean: float = 0.5,
                  std: float = 0.5, n_threads: int = 8,
                  out: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode + resize + normalize a list of frame paths natively.

    -> (len(paths), out_size, out_size, 3) float32; frames that fail to
    decode come back zeroed (matching the library's contract)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native clipdecode unavailable (build failed)")
    n = len(paths)
    if out is None:
        out = np.empty((n, out_size, out_size, 3), np.float32)
    assert out.shape == (n, out_size, out_size, 3) and \
        out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.decode_frames(
        arr, n, out_size, ctypes.c_float(mean), ctypes.c_float(std),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if ok != n:
        import warnings
        warnings.warn(f"clipdecode: {n - ok}/{n} frames failed to decode")
    return out
