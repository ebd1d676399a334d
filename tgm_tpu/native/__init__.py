"""Native (C++) host-side runtime kernels.

The TPU owns model compute; this package accelerates the host data path —
the event-timeline sorts and binary searches that dominate large-graph ingest
(SURVEY.md §3.1). Compiled lazily with the system toolchain into a cached
shared object and bound through ctypes; every entry point has a numpy
fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fast_host_ops.cpp")
_LIB_NAME = "libtgm_fast_host_ops.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build_dir() -> str:
    d = os.environ.get("TGM_TPU_NATIVE_CACHE") or os.path.join(
        tempfile.gettempdir(), "tgm_tpu_native"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        so_path = os.path.join(_build_dir(), _LIB_NAME)
        try:
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
                cmd = [
                    "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
                    "-fopenmp", _SRC, "-o", so_path + ".tmp",
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.stable_sort_perm_i64.restype = ctypes.c_int
            lib.lexsort2_perm_i64.restype = ctypes.c_int
            lib.searchsorted_i64.restype = None
            _lib = lib
        except Exception:
            _load_failed = True
            _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


# Below this size the numpy paths win on call overhead.
_MIN_NATIVE_N = 1 << 16


def stable_sort_perm(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of non-negative integer keys (parallel radix sort)."""
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    lib = _load()
    if lib is None or len(keys) < _MIN_NATIVE_N or (len(keys) and keys.min() < 0):
        return np.argsort(keys, kind="stable")
    perm = np.empty(len(keys), dtype=np.int64)
    rc = lib.stable_sort_perm_i64(_ptr(keys), ctypes.c_int64(len(keys)), _ptr(perm))
    if rc != 0:  # pragma: no cover - guarded above
        return np.argsort(keys, kind="stable")
    return perm


def lexsort2_perm(primary: np.ndarray, secondary: np.ndarray) -> np.ndarray:
    """Stable argsort by (primary, secondary), both non-negative ints."""
    primary = np.ascontiguousarray(primary, dtype=np.int64)
    secondary = np.ascontiguousarray(secondary, dtype=np.int64)
    lib = _load()
    small = len(primary) < _MIN_NATIVE_N
    if lib is None or small or (len(primary) and (primary.min() < 0 or secondary.min() < 0)):
        return np.lexsort((secondary, primary))
    perm = np.empty(len(primary), dtype=np.int64)
    rc = lib.lexsort2_perm_i64(
        _ptr(primary), _ptr(secondary), ctypes.c_int64(len(primary)), _ptr(perm)
    )
    if rc != 0:  # pragma: no cover
        return np.lexsort((secondary, primary))
    return perm


def searchsorted(sorted_arr: np.ndarray, queries: np.ndarray, side: str = "left") -> np.ndarray:
    """Batched parallel binary search over a sorted int64 array."""
    sorted_arr = np.ascontiguousarray(sorted_arr, dtype=np.int64)
    queries = np.ascontiguousarray(queries, dtype=np.int64)
    lib = _load()
    if lib is None or len(queries) < 1024:
        return np.searchsorted(sorted_arr, queries, side=side)
    out = np.empty(len(queries), dtype=np.int64)
    lib.searchsorted_i64(
        _ptr(sorted_arr), ctypes.c_int64(len(sorted_arr)), _ptr(queries),
        ctypes.c_int64(len(queries)), ctypes.c_int(0 if side == "left" else 1), _ptr(out),
    )
    return out
