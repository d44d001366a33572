"""Moller-Trumbore ray/triangle intersection (vectorized, fp32).

The device-side analog of the hardware triangle test the reference gets from
VK_KHR_ray_tracing.  Backface culling follows
gl_RayFlagsCullBackFacingTrianglesEXT semantics (RayGen.rgen:335-338) with
the per-instance facing-cull-disable for double-sided materials
(SceneHelpers.cpp:166-192): a back hit (det < 0) survives only when culling
is off for the ray or the triangle is double-sided.
"""

from __future__ import annotations

import jax.numpy as jnp

_DET_EPS = 1e-12


def intersect(origin, direction, v0, e1, e2, double_sided,
              t_min, t_max, cull_backface: bool):
    """Intersect one ray against a batch of triangles.

    origin/direction: (3,); v0/e1/e2: (K, 3); double_sided: (K,) bool;
    t_min/t_max scalars.  Returns (t, u, v, hit) with shapes (K,).
    """
    pvec = jnp.cross(jnp.broadcast_to(direction, e2.shape), e2)
    det = jnp.einsum("kc,kc->k", e1, pvec)
    if cull_backface:
        facing_ok = (det > _DET_EPS) | (double_sided & (jnp.abs(det) > _DET_EPS))
    else:
        facing_ok = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(jnp.abs(det) > _DET_EPS, det, 1.0)
    tvec = origin - v0
    u = jnp.einsum("kc,kc->k", tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.einsum("c,kc->k", direction, qvec) * inv_det
    t = jnp.einsum("kc,kc->k", e2, qvec) * inv_det
    hit = (facing_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t >= t_min) & (t <= t_max))
    return t, u, v, hit
