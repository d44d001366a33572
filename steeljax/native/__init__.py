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
    lib.steeljax_build_sbvh.restype = ctypes.c_int
    lib.steeljax_build_sbvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def build_bvh_sah(tri_pos: np.ndarray, max_leaf: int,
                  spatial_alpha: float = 0.0, dup_ratio: float = 1.5
                  ) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Binned-SAH / SBVH build.  Returns (nodes (N, 8) f32, refs (R,)
    int64, depth) or None if the native library is unavailable.

    `spatial_alpha` > 0 enables Stich-style spatial splits (the Vulkan
    driver's ePreferFastTrace analog, AccelerationStructureManager.cpp:
    8-17): refs is then a REFERENCE list (a triangle id may appear in
    several leaves, R <= dup_ratio * T), not a permutation; consumers
    gather attributes by slot, which handles duplicates for free."""
    lib = get_library()
    if lib is None:
        return None
    tris = np.ascontiguousarray(
        np.asarray(tri_pos, np.float32).reshape(-1, 9))
    count = len(tris)
    if count == 0:
        return None
    ref_capacity = (count if spatial_alpha <= 0
                    else int(count * dup_ratio) + 16)
    capacity = 2 * ref_capacity + 2
    nodes = np.zeros((capacity, 8), np.float32)
    refs = np.zeros(ref_capacity, np.int64)
    node_count = ctypes.c_int64(0)
    ref_count = ctypes.c_int64(0)
    depth = ctypes.c_int(0)
    status = lib.steeljax_build_sbvh(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(count), ctypes.c_int(max_leaf),
        ctypes.c_float(spatial_alpha),
        nodes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(capacity),
        refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(ref_capacity),
        ctypes.byref(node_count), ctypes.byref(ref_count),
        ctypes.byref(depth))
    if status != 0:
        return None
    return (nodes[:node_count.value].copy(),
            refs[:ref_count.value].copy(), int(depth.value))
