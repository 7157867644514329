"""ctypes loader for the native C++ BVH builder.

Compiled on first use with g++ (cached as a .so next to the source); any
failure falls back to the pure-numpy builder silently. The reference's
equivalent component is the rayon-parallel Rust builder (bvh.rs:152-207).
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "bvh_builder.cpp"
_SO = _DIR / "_bvh_builder.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.warning("native BVH builder compile failed (%s); using numpy", e)
        return False


def get_lib():
    """Returns the loaded library or None."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            log.warning("native BVH builder load failed (%s)", e)
            return None
        lib.rt2_build_bvh.restype = ctypes.c_int32
        lib.rt2_build_bvh.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,   # v0 v1 v2
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,      # n, leaf, q
            ctypes.c_void_p, ctypes.c_void_p,                    # min max
            ctypes.c_void_p, ctypes.c_void_p,                    # left right
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,   # first count axis
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,     # order maxn par
        ]
        _lib = lib
        return _lib


def build_native(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                 max_leaf: int, quality: int, parallel: bool = True):
    """Returns dict of node arrays + order, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(v0)
    max_nodes = max(2 * n + 16, 64)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    left = np.empty(max_nodes, np.int32)
    right = np.empty(max_nodes, np.int32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    axis = np.empty(max_nodes, np.int32)
    order = np.empty(max(n, 1), np.int64)

    v0 = np.ascontiguousarray(v0, np.float32)
    v1 = np.ascontiguousarray(v1, np.float32)
    v2 = np.ascontiguousarray(v2, np.float32)

    ptr = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    n_nodes = lib.rt2_build_bvh(
        ptr(v0), ptr(v1), ptr(v2), n, max_leaf, quality,
        ptr(node_min), ptr(node_max), ptr(left), ptr(right), ptr(first),
        ptr(count), ptr(axis), ptr(order), max_nodes, 1 if parallel else 0)
    if n_nodes < 0:
        log.warning("native BVH builder overflowed node buffer; using numpy")
        return None
    s = slice(0, n_nodes)
    return dict(node_min=node_min[s], node_max=node_max[s], node_left=left[s],
                node_right=right[s], node_first=first[s],
                node_count=count[s], node_axis=axis[s],
                tri_order=order[:n])
