"""Woop unit-triangle transforms: triangle intersection as dense linear
algebra.

Instead of Moller-Trumbore's per-triangle cross products (which force
scalar broadcasts in a packet kernel), each triangle precomputes the affine
map A^-1 that takes world space to its unit-triangle frame (A = [e1 e2 n]).
A ray intersects via two matrix applications:

    o' = A^-1 o - b,  d' = A^-1 d,  t = -o'_w / d'_w,
    u = o'_u + t d'_u,  v = o'_v + t d'_v

For a packet of B rays against a leaf of L triangles this is two
(B, 3) x (3, L) contractions per component group — MXU-shaped work with no
per-triangle scalar extraction.  [Woop, Schmittler, Slusallek 2005 — "RPU";
the transform-based triangle test used in its ray core.]

Packed layout (T, 16) f32:
  [r0.xyz, r1.xyz, r2.xyz, b.xyz, double_sided, pad, pad, pad]
where r_i are the rows of A^-1 and b = A^-1 v0.

Status: kept as the building block for a future MXU-contraction leaf
kernel (the round-1 experiment was layout-bound — see
memory: steeljax-perf-landscape); not wired into the dispatch path.
"""

from __future__ import annotations

import numpy as np


def pack_woop(tri_pos: np.ndarray, tri_double_sided: np.ndarray) -> np.ndarray:
    tri_pos = np.asarray(tri_pos, np.float64)
    t = tri_pos.shape[0]
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    n = np.cross(e1, e2)

    a = np.stack([e1, e2, n], axis=-1)  # (T, 3, 3) columns e1|e2|n
    det = np.linalg.det(a)
    ok = np.abs(det) > 1e-24
    a_safe = np.where(ok[:, None, None], a, np.eye(3)[None])
    ainv = np.linalg.inv(a_safe)
    ainv[~ok] = 0.0  # degenerate/pad triangles can never be hit

    b = np.einsum("tij,tj->ti", ainv, v0)

    packed = np.zeros((t, 16), np.float32)
    packed[:, 0:3] = ainv[:, 0]
    packed[:, 3:6] = ainv[:, 1]
    packed[:, 6:9] = ainv[:, 2]
    packed[:, 9:12] = b
    packed[:, 12] = np.asarray(tri_double_sided, np.float32)
    return packed
