"""Native runtime helpers (C++ host-side input path).

Compiled lazily with g++ into a cached .so and bound via ctypes
(no pybind11 in this environment).  Falls back to numpy when no
toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "basket.cpp")
    try:
        with open(src, "rb") as f:
            tag = hashlib.md5(f.read()).hexdigest()[:12]
        cache_dir = os.path.join(tempfile.gettempdir(), "studiogan_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"basket_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-fopenmp", src, "-o", tmp],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.assemble_basket.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.quantize_images.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def assemble_basket(images_u8: np.ndarray, indices: np.ndarray,
                    flips: np.ndarray) -> np.ndarray | None:
    """Gather + [-1,1] normalize + flip in one native pass.
    images_u8: (N, H, W, C) uint8; returns (n, H, W, C) float32 or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    images_u8 = np.ascontiguousarray(images_u8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    flips = np.ascontiguousarray(flips, dtype=np.uint8)
    n = len(indices)
    _, h, w, c = images_u8.shape
    out = np.empty((n, h, w, c), dtype=np.float32)
    lib.assemble_basket(
        images_u8.ctypes.data, indices.ctypes.data, flips.ctypes.data,
        out.ctypes.data, n, h, w, c)
    return out


def quantize_images_native(x: np.ndarray) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = np.empty(x.shape, dtype=np.uint8)
    lib.quantize_images(x.ctypes.data, out.ctypes.data, x.size)
    return out
