"""Runtime light-volume sampling: tetrahedral walk + SH irradiance.

Parity with SampleLightVolume (Lighting.glsl:104-182): starting from tet 0,
compute barycentric coordinates via the per-tet inverse matrix, hop across
the face of the most negative coordinate to that face's neighbor, stop when
inside (all coords >= 0), when stepping outside the hull (-1 neighbor ->
black, matching the reference), or when ping-ponging between two tets.
The walk is a vmapped bounded while_loop; SH coefficients of the 4 corner
probes interpolate barycentrically before the Ramamoorthi evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from steeljax.gi.sh import eval_irradiance

MAX_WALK_STEPS = 64


def _bary(lv, tet, p):
    d = lv.positions[lv.tet_vertices[tet, 3]]
    uvw = lv.tet_matrices[tet] @ (p - d)
    return jnp.concatenate([uvw, (1.0 - uvw.sum())[None]])


def _find_tet(lv, p):
    """Walk to the containing tet; returns (tet, bary, valid)."""

    def cond(state):
        tet, prev, steps, done = state
        return (~done) & (steps < MAX_WALK_STEPS)

    def body(state):
        tet, prev, steps, done = state
        bary = _bary(lv, tet, p)
        worst = jnp.argmin(bary)
        inside = bary[worst] >= 0.0
        nxt = lv.tet_neighbors[tet, worst]
        pingpong = nxt == prev
        stop = inside | pingpong | (nxt < 0)
        new_tet = jnp.where(stop, tet, nxt)
        new_prev = jnp.where(stop, prev, tet)
        # Walking off the hull means "no data" (Lighting.glsl:140-147).
        invalid = (~inside) & (nxt < 0)
        return (jnp.where(invalid, jnp.int32(-1), new_tet), new_prev,
                steps + 1, stop)

    tet, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                     jnp.asarray(False)))
    valid = tet >= 0
    tet_safe = jnp.maximum(tet, 0)
    bary = _bary(lv, tet_safe, p)
    # Ping-pong/step-limit endings can leave slightly negative
    # coordinates; clamp + renormalize instead of extrapolating (the
    # reference interpolates whatever it stopped on — this is strictly
    # more robust for sliver tets).
    bary = jnp.maximum(bary, 0.0)
    bary = bary / jnp.maximum(bary.sum(), 1e-8)
    return tet_safe, bary, valid


@jax.jit
def sample_light_volume(lv, position: jnp.ndarray,
                        n: jnp.ndarray) -> jnp.ndarray:
    """Irradiance at (position, normal) batches (N, 3) -> (N, 3)."""

    def per_point(p, normal):
        tet, bary, valid = _find_tet(lv, p)
        verts = lv.tet_vertices[tet]                    # (4,)
        coeffs = lv.coefficients[verts]                 # (4, 9, 3)
        blended = jnp.einsum("k,kic->ic", bary, coeffs)
        # SH-9 ringing can go negative; irradiance is non-negative.
        irr = jnp.maximum(eval_irradiance(blended, normal), 0.0)
        return jnp.where(valid, irr, 0.0)

    if lv.tet_vertices.shape[0] == 0:
        return jnp.zeros(position.shape[:-1] + (3,), jnp.float32)
    return jax.vmap(per_point)(position, n)
