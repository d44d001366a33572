"""Ray traversal: brute-force reference path and BVH stack traversal.

`trace_nearest` is the steeljax analog of traceRayEXT + closest-hit
(RayGen.rgen:341-342); `trace_any` of the terminate-on-first-hit ray query
used for shadows (RayGen.rgen:127-178, Lighting.glsl:37-87).  Alpha-test
(any-hit shader) semantics are handled by the caller re-tracing past
rejected hits — see steeljax.render.pt.integrator.

Operates on the explicit-node BVH format (steeljax.accel.bvh).  All entry
points take a batch of rays (N, 3) and vectorize via vmap; the stack-based
while_loop lowers to a lockstep batched loop under XLA (the CPU/test
backend — the TPU path is steeljax.accel.pallas_traverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from steeljax.accel.bvh import BVH
from steeljax.accel.intersect import intersect

_INF = jnp.float32(3.0e38)


def _pack_tris(tri_pos):
    v0 = tri_pos[:, 0, :]
    e1 = tri_pos[:, 1, :] - v0
    e2 = tri_pos[:, 2, :] - v0
    return v0, e1, e2


# ---------------------------------------------------------------------------
# Brute force (correctness oracle + small scenes)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cull_backface", "chunk"))
def trace_nearest_brute(tri_pos, tri_double_sided, origins, directions,
                        t_min, t_max, cull_backface: bool = True,
                        chunk: int = 2048):
    """O(rays x tris) nearest-hit in triangle chunks of size `chunk`."""
    v0, e1, e2 = _pack_tris(tri_pos)
    count = tri_pos.shape[0]
    padded = -(-count // chunk) * chunk
    pad = padded - count
    v0 = jnp.pad(v0, ((0, pad), (0, 0)), constant_values=3e37)
    e1 = jnp.pad(e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    ds = jnp.pad(tri_double_sided, (0, pad))

    def per_ray(o, d, tmin, tmax):
        def body(i, best):
            best_t, best_i, best_u, best_v = best
            base = i * chunk
            cv0 = jax.lax.dynamic_slice(v0, (base, 0), (chunk, 3))
            ce1 = jax.lax.dynamic_slice(e1, (base, 0), (chunk, 3))
            ce2 = jax.lax.dynamic_slice(e2, (base, 0), (chunk, 3))
            cds = jax.lax.dynamic_slice(ds, (base,), (chunk,))
            t, u, v, hit = intersect(o, d, cv0, ce1, ce2, cds,
                                     tmin, tmax, cull_backface)
            t = jnp.where(hit & (t < best_t), t, _INF)
            k = jnp.argmin(t)
            better = t[k] < best_t
            return (jnp.where(better, t[k], best_t),
                    jnp.where(better, (base + k).astype(jnp.int32), best_i),
                    jnp.where(better, u[k], best_u),
                    jnp.where(better, v[k], best_v))

        init = (tmax, jnp.int32(-1), jnp.float32(0), jnp.float32(0))
        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, padded // chunk, body, init)
        return best_t, best_i, best_u, best_v

    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), origins.shape[:1])
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origins.shape[:1])
    t, idx, u, v = jax.vmap(per_ray)(origins, directions, tmin, tmax)
    hit = idx >= 0
    t = jnp.where(hit, t, -1.0)
    return {"t": t, "tri": idx, "u": u, "v": v, "hit": hit}


# ---------------------------------------------------------------------------
# BVH traversal (explicit-node format)
# ---------------------------------------------------------------------------

def _slab(node_row, o, inv_d, t_min, t_far):
    t0 = (node_row[0:3] - o) * inv_d
    t1 = (node_row[3:6] - o) * inv_d
    near = jnp.max(jnp.minimum(t0, t1))
    far = jnp.min(jnp.maximum(t0, t1))
    hit = (near <= far) & (far >= t_min) & (near <= t_far)
    return hit, near


@functools.partial(jax.jit,
                   static_argnames=("cull_backface", "any_hit"))
def trace_nearest(bvh: BVH, tri_pos, tri_double_sided, origins, directions,
                  t_min, t_max, cull_backface: bool = True,
                  any_hit: bool = False, tri_alpha_mask=None):
    """Nearest-hit (or first-hit when any_hit=True) BVH traversal.

    Returns dict of (N,) arrays: t (-1 on miss), tri (padded-array triangle
    index, -1 on miss), u, v barycentrics, hit mask.

    `tri_alpha_mask` ((T,) uint32/int32, accel.alphamask) applies the same
    in-traversal conservative alpha rejection as the Pallas kernel's
    alpha_mask mode, so this stays an exact oracle for masked tables.
    """
    v0, e1, e2 = _pack_tris(tri_pos)
    amask = (None if tri_alpha_mask is None
             else jnp.asarray(tri_alpha_mask).astype(jnp.int32))
    max_leaf = bvh.max_leaf
    stack_size = bvh.depth + 2
    nodes = bvh.nodes
    n_nodes = nodes.shape[0]
    n_tris = tri_pos.shape[0]
    lane = jnp.arange(max_leaf)

    def per_ray(o, d, tmin, tmax):
        safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        inv_d = 1.0 / safe_d

        stack = jnp.zeros((stack_size,), jnp.int32)
        state = (jnp.int32(1), stack, tmax, jnp.int32(-1),
                 jnp.float32(0), jnp.float32(0))

        def cond(state):
            return state[0] > 0

        def body(state):
            sp, stack, best_t, best_i, best_u, best_v = state
            sp = sp - 1
            node = stack[sp]
            row = nodes[node]
            meta0 = row[6].astype(jnp.int32)
            cnt = row[7].astype(jnp.int32)
            is_leaf = cnt > 0

            # Internal: test both children, push far-then-near.
            left = jnp.clip(meta0, 0, n_nodes - 1)
            right = jnp.clip(meta0 + 1, 0, n_nodes - 1)
            hit_l, near_l = _slab(nodes[left], o, inv_d, tmin, best_t)
            hit_r, near_r = _slab(nodes[right], o, inv_d, tmin, best_t)
            swap = near_r < near_l
            first = jnp.where(swap, right, left)
            second = jnp.where(swap, left, right)
            hit_first = jnp.where(swap, hit_r, hit_l)
            hit_second = jnp.where(swap, hit_l, hit_r)

            push_second = (~is_leaf) & hit_second
            stack2 = stack.at[sp].set(jnp.where(push_second, second,
                                                stack[sp]))
            sp2 = sp + push_second.astype(jnp.int32)
            push_first = (~is_leaf) & hit_first
            stack2 = stack2.at[sp2].set(
                jnp.where(push_first, first, stack2[sp2]))
            sp2 = sp2 + push_first.astype(jnp.int32)

            # Leaf: contiguous triangle chunk test with count mask.
            base = jnp.clip(meta0, 0, max(n_tris - max_leaf, 0))
            cv0 = jax.lax.dynamic_slice(v0, (base, 0), (max_leaf, 3))
            ce1 = jax.lax.dynamic_slice(e1, (base, 0), (max_leaf, 3))
            ce2 = jax.lax.dynamic_slice(e2, (base, 0), (max_leaf, 3))
            cds = jax.lax.dynamic_slice(tri_double_sided, (base,),
                                        (max_leaf,))
            t, u, v, hit = intersect(o, d, cv0, ce1, ce2, cds,
                                     tmin, best_t, cull_backface)
            hit = hit & is_leaf & (lane < cnt)
            if amask is not None:
                from steeljax.accel.alphamask import mask_test
                cm = jax.lax.dynamic_slice(amask, (base,), (max_leaf,))
                hit = hit & mask_test(cm, u, v)
            t = jnp.where(hit, t, _INF)
            k = jnp.argmin(t)
            better = t[k] < best_t
            best_t = jnp.where(better, t[k], best_t)
            best_i = jnp.where(better, (base + k).astype(jnp.int32), best_i)
            best_u = jnp.where(better, u[k], best_u)
            best_v = jnp.where(better, v[k], best_v)

            if any_hit:
                sp2 = jnp.where(best_i >= 0, 0, sp2)

            return (sp2, stack2, best_t, best_i, best_u, best_v)

        _, _, best_t, best_i, best_u, best_v = jax.lax.while_loop(
            cond, body, state)
        return best_t, best_i, best_u, best_v

    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), origins.shape[:1])
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origins.shape[:1])
    t, idx, u, v = jax.vmap(per_ray)(origins, directions, tmin, tmax)
    hit = idx >= 0
    t = jnp.where(hit, t, -1.0)
    return {"t": t, "tri": idx, "u": u, "v": v, "hit": hit}


def trace_any(bvh: BVH, tri_pos, tri_double_sided, origins, directions,
              t_min, t_max, tri_alpha_mask=None):
    """Visibility query: does any (non-alpha-tested) surface block the ray?

    Matches TraceVisibilityRay with terminate-on-first-hit and no backface
    culling (RayGen.rgen:127-178).  Returns a (N,) bool occlusion mask.
    With `tri_alpha_mask`, provably-transparent candidates never block
    (they would not block under the exact any-hit test either).
    """
    rec = trace_nearest(bvh, tri_pos, tri_double_sided, origins, directions,
                        t_min, t_max, cull_backface=False, any_hit=True,
                        tri_alpha_mask=tri_alpha_mask)
    return rec["hit"]
