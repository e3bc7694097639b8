"""ctypes bridge to the native C++ runtime components (native/librepack.so).

The reference's runtime is C/C++ end to end; here the JAX/XLA graph owns the
compute path and native code owns the host runtime hot loops. First component:
the GGUF block repacker (wire blocks -> K-major device arrays), OpenMP-parallel,
~10-30x the numpy path on large checkpoints. Auto-builds with the system g++ on
first use when the shared library is missing; callers fall back to numpy when
neither works.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "librepack.so")
_lib = None
_lock = threading.Lock()
_tried = False


def _build() -> bool:
    src_dir = os.path.join(_ROOT, "native")
    if not os.path.exists(os.path.join(src_dir, "repack.cpp")):
        return False
    try:
        subprocess.run(["make", "-C", src_dir, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i8 = np.ctypeslib.ndpointer(np.int8, flags="C")
        f4 = np.ctypeslib.ndpointer(np.float32, flags="C")
        i64 = ctypes.c_int64
        L.repack_q8_0.argtypes = [u8, i64, i64, i8, f4]
        L.repack_q4_0.argtypes = [u8, i64, i64, u8, f4, f4]
        L.repack_q4_k.argtypes = [u8, i64, i64, u8, f4, f4]
        L.repack_q5_k.argtypes = [u8, i64, i64, i8, f4, f4]
        L.repack_q6_k.argtypes = [u8, i64, i64, i8, f4]
        _lib = L
        return _lib


def native_repack(raw: np.ndarray, type_name: str, n: int, k: int):
    """Try the native repacker. Returns (kind, qs, a, b, g) or None."""
    L = lib()
    if L is None:
        return None
    raw = np.ascontiguousarray(raw).view(np.uint8).reshape(-1)
    if type_name == "Q8_0":
        qT = np.empty((k, n), np.int8)
        aT = np.empty((k // 32, n), np.float32)
        L.repack_q8_0(raw, n, k, qT, aT)
        return "q8b", qT, aT, None, 32
    if type_name == "Q4_0" and k % 256 == 0:
        qT = np.empty((k // 2, n), np.uint8)
        aT = np.empty((k // 32, n), np.float32)
        bT = np.empty((k // 32, n), np.float32)
        L.repack_q4_0(raw, n, k, qT, aT, bT)
        from .ops.repack import _fold_hi_plane
        aT, bT = _fold_hi_plane(aT, bT, 32)
        return "q4b", qT, aT, bT, 32
    if type_name == "Q4_K":
        qT = np.empty((k // 2, n), np.uint8)
        aT = np.empty((k // 32, n), np.float32)
        bT = np.empty((k // 32, n), np.float32)
        L.repack_q4_k(raw, n, k, qT, aT, bT)
        from .ops.repack import _fold_hi_plane
        aT, bT = _fold_hi_plane(aT, bT, 32)
        return "q4b", qT, aT, bT, 32
    if type_name == "Q5_K":
        qT = np.empty((k, n), np.int8)
        aT = np.empty((k // 32, n), np.float32)
        bT = np.empty((k // 32, n), np.float32)
        L.repack_q5_k(raw, n, k, qT, aT, bT)
        return "q8b", qT, aT, bT, 32
    if type_name == "Q6_K":
        qT = np.empty((k, n), np.int8)
        aT = np.empty((k // 16, n), np.float32)
        L.repack_q6_k(raw, n, k, qT, aT)
        return "q8b", qT, aT, None, 16
    return None
