"""Native (C++) components, loaded via ctypes.

The reference's performance-critical native code is its Vulkan RHI; most
of that dissolves into XLA, but acceleration-structure builds stay
host-side and CPU-bound — so the binned-SAH BVH builder is C++
(bvh_builder.cpp), compiled on first use with the toolchain baked into the
image and cached next to the source.  `build_bvh_sah` falls back to None
when no compiler is available; callers then use the numpy Morton builder.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO_PATH = _DIR / "libsteeljax_native.so"
_lib = None
_lib_failed = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", str(_DIR / "bvh_builder.cpp"),
             "-o", str(_SO_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as exc:  # compiler missing/failed: fall back
        print(f"steeljax.native: C++ build failed ({exc}); "
              "using numpy builder", file=sys.stderr)
        return False


def get_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _SO_PATH.exists():
        src_mtime = (_DIR / "bvh_builder.cpp").stat().st_mtime
        if not _compile():
            _lib_failed = True
            return None
    elif (_DIR / "bvh_builder.cpp").stat().st_mtime > _SO_PATH.stat().st_mtime:
        if not _compile():
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        if not _compile():
            _lib_failed = True
            return None
        lib = ctypes.CDLL(str(_SO_PATH))
    lib.steeljax_build_bvh.restype = ctypes.c_int
    lib.steeljax_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def build_bvh_sah(tri_pos: np.ndarray, max_leaf: int
                  ) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Binned-SAH build.  Returns (nodes (N, 8) f32, permutation (T,)
    int64, depth) or None if the native library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    tris = np.ascontiguousarray(
        np.asarray(tri_pos, np.float32).reshape(-1, 9))
    count = len(tris)
    if count == 0:
        return None
    capacity = 2 * count + 2
    nodes = np.zeros((capacity, 8), np.float32)
    perm = np.zeros(count, np.int64)
    node_count = ctypes.c_int64(0)
    depth = ctypes.c_int(0)
    status = lib.steeljax_build_bvh(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(count), ctypes.c_int(max_leaf),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(capacity),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(node_count), ctypes.byref(depth))
    if status != 0:
        return None
    return nodes[:node_count.value].copy(), perm, int(depth.value)
