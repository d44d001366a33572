"""Probe placement: octree subdivision filtered by a geometry oracle.

Parity with GlobalIllumination.cpp:34-161: extend the scene AABB by 0.25,
recursively split boxes (stop at min edge 0.5), keep boxes that contain
geometry, and dedup their corner positions.  The reference's oracle is a
GPU occlusion-query raster (OcclusionRenderer); ours is a direct
triangle-AABB overlap test over the flattened scene — simpler, exact, and
TPU-free (the bake's host side).
"""

from __future__ import annotations

import numpy as np

MIN_EDGE = 0.5            # GlobalIllumination.cpp:34
BBOX_EXTENSION = 0.25     # GlobalIllumination.cpp:61-66


def scene_aabb(tri_pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """AABB over real (non-pad) triangles."""
    tri_pos = np.asarray(tri_pos)
    real = tri_pos[:, 0, 0] < 1e30
    pts = tri_pos[real].reshape(-1, 3)
    if len(pts) == 0:
        return np.zeros(3, np.float32), np.zeros(3, np.float32)
    return pts.min(axis=0), pts.max(axis=0)


class GeometryOracle:
    """'Does this box contain geometry?' via triangle-AABB overlap
    (the OcclusionRenderer::ContainsGeometry replacement)."""

    def __init__(self, tri_pos: np.ndarray):
        tri_pos = np.asarray(tri_pos)
        real = tri_pos[:, 0, 0] < 1e30
        tris = tri_pos[real]
        self.tri_min = tris.min(axis=1)
        self.tri_max = tris.max(axis=1)

    def contains_geometry(self, lo: np.ndarray, hi: np.ndarray) -> bool:
        if len(self.tri_min) == 0:
            return False
        overlap = ((self.tri_min <= hi).all(axis=1)
                   & (self.tri_max >= lo).all(axis=1))
        return bool(overlap.any())


def generate_probe_positions(tri_pos: np.ndarray,
                             min_edge: float = MIN_EDGE,
                             extension: float = BBOX_EXTENSION,
                             max_probes: int = 4096) -> np.ndarray:
    """Octree-split probe positions (GlobalIllumination.cpp:61-161);
    returns (P, 3) float32 unique corner positions."""
    lo, hi = scene_aabb(tri_pos)
    lo = lo - extension
    hi = hi + extension
    oracle = GeometryOracle(tri_pos)

    corners: list[np.ndarray] = []
    stack = [(lo, hi)]
    while stack:
        blo, bhi = stack.pop()
        if not oracle.contains_geometry(blo, bhi):
            continue
        edge = (bhi - blo).max()
        if edge <= min_edge * 2.0 + 1e-6:
            # Terminal box: emit its 8 corners.
            for i in range(8):
                corner = np.where(
                    [(i >> k) & 1 for k in range(3)], bhi, blo)
                corners.append(corner.astype(np.float32))
            continue
        mid = 0.5 * (blo + bhi)
        for i in range(8):
            sel = np.array([(i >> k) & 1 for k in range(3)], bool)
            clo = np.where(sel, mid, blo)
            chi = np.where(sel, bhi, mid)
            stack.append((clo, chi))

    if not corners:
        return np.zeros((0, 3), np.float32)
    positions = np.unique(
        np.round(np.stack(corners) / 1e-4).astype(np.int64), axis=0
    ).astype(np.float32) * 1e-4
    if len(positions) > max_probes:
        step = -(-len(positions) // max_probes)
        positions = positions[::step]
    return positions
