"""Pallas TPU packet BVH traversal.

The Vulkan reference gets per-ray MIMD traversal from RT cores
(traceRayEXT); a TPU has neither per-lane control flow nor hardware
traversal, so the idiomatic design is *packet traversal* (Wald-style):

* a block of 1024 rays (one (8, 128) f32 tile per component) traverses the
  tree together;
* the traversal stack is scalar state in SMEM — control flow is uniform
  across the packet;
* a node is descended if ANY ray in the packet intersects its AABB (a
  vector test + scalar any-reduce);
* leaf triangles are streamed as scalar broadcasts against the whole
  packet — zero gathers anywhere.

BVH nodes and triangles live in VMEM for the duration of the kernel
(scenes beyond VMEM are handled by chunked sub-BVH passes at the caller —
see steeljax.accel.dispatch).  This trades wasted lanes on incoherent
packets for perfectly dense VPU work, which is the right trade on this
hardware; ray reordering between bounces recovers coherence (SURVEY.md §7).

Node/triangle packing:
  nodes_packed: (N, 8)  f32 [min.xyz, max.xyz, pad, pad]   heap order
  tris_packed:  (T, 16) f32 [v0.xyz, e1.xyz, e2.xyz, double_sided, pad...]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from steeljax.accel.bvh import BVH

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES  # rays per packet

_BIG = jnp.float32(3.0e38)
_DET_EPS = 1e-12


def pack_nodes(bvh: BVH) -> np.ndarray:
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    n = node_min.shape[0]
    packed = np.zeros((n, 8), np.float32)
    packed[:, 0:3] = node_min
    packed[:, 3:6] = node_max
    return packed


def pack_tris(tri_pos: np.ndarray, tri_double_sided: np.ndarray) -> np.ndarray:
    tri_pos = np.asarray(tri_pos, np.float32)
    t = tri_pos.shape[0]
    packed = np.zeros((t, 16), np.float32)
    packed[:, 0:3] = tri_pos[:, 0]
    packed[:, 3:6] = tri_pos[:, 1] - tri_pos[:, 0]
    packed[:, 6:9] = tri_pos[:, 2] - tri_pos[:, 0]
    packed[:, 9] = np.asarray(tri_double_sided, np.float32)
    return packed


def _traverse_kernel(nodes_ref, tris_ref, ox, oy, oz, dx, dy, dz,
                     tmn, tmx, out_t, out_u, out_v, out_i,
                     stack_ref, sp_ref, bt_ref, bu_ref, bv_ref, bi_ref,
                     *, first_leaf: int, leaf_size: int,
                     cull_backface: bool, any_hit: bool = False):
    f32 = jnp.float32

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d < 0, -1e-12, 1e-12), d)

    inv_dx = safe_inv(dx[:])
    inv_dy = safe_inv(dy[:])
    inv_dz = safe_inv(dz[:])

    bt_ref[:] = tmx[:]
    bu_ref[:] = jnp.zeros_like(tmx[:])
    bv_ref[:] = jnp.zeros_like(tmx[:])
    bi_ref[:] = jnp.full(tmx.shape, -1, jnp.int32)

    stack_ref[0] = 0
    sp_ref[0] = 1

    def cond(_):
        return sp_ref[0] > 0

    def body(_):
        sp = sp_ref[0]
        node = stack_ref[sp - 1]
        sp_ref[0] = sp - 1

        @pl.when(node < first_leaf)
        def _internal():
            for k in range(2):
                child = 2 * node + 1 + k
                row = nodes_ref[child]  # (8,)
                t0x = (row[0] - ox[:]) * inv_dx
                t1x = (row[3] - ox[:]) * inv_dx
                t0y = (row[1] - oy[:]) * inv_dy
                t1y = (row[4] - oy[:]) * inv_dy
                t0z = (row[2] - oz[:]) * inv_dz
                t1z = (row[5] - oz[:]) * inv_dz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z))
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                hit = (near <= far) & (far >= tmn[:]) & (near <= bt_ref[:])
                any_hit = jnp.any(hit)

                @pl.when(any_hit)
                def _push():
                    s = sp_ref[0]
                    stack_ref[s] = child
                    sp_ref[0] = s + 1

        @pl.when(node >= first_leaf)
        def _leaf():
            base = (node - first_leaf) * leaf_size
            for l in range(leaf_size):
                tri = tris_ref[base + l]  # (16,)
                v0x, v0y, v0z = tri[0], tri[1], tri[2]
                e1x, e1y, e1z = tri[3], tri[4], tri[5]
                e2x, e2y, e2z = tri[6], tri[7], tri[8]
                ds = tri[9]

                # pvec = d x e2
                px = dy[:] * e2z - dz[:] * e2y
                py = dz[:] * e2x - dx[:] * e2z
                pz = dx[:] * e2y - dy[:] * e2x
                det = e1x * px + e1y * py + e1z * pz
                if cull_backface:
                    facing = (det > _DET_EPS) | (
                        (ds > 0.5) & (jnp.abs(det) > _DET_EPS))
                else:
                    facing = jnp.abs(det) > _DET_EPS
                inv_det = 1.0 / jnp.where(jnp.abs(det) > _DET_EPS, det, 1.0)
                tx = ox[:] - v0x
                ty = oy[:] - v0y
                tz = oz[:] - v0z
                u = (tx * px + ty * py + tz * pz) * inv_det
                # qvec = tvec x e1
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx[:] * qx + dy[:] * qy + dz[:] * qz) * inv_det
                t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                hit = (facing & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t >= tmn[:]) & (t <= bt_ref[:]))
                bt_ref[:] = jnp.where(hit, t, bt_ref[:])
                bu_ref[:] = jnp.where(hit, u, bu_ref[:])
                bv_ref[:] = jnp.where(hit, v, bv_ref[:])
                bi_ref[:] = jnp.where(hit, jnp.int32(base + l), bi_ref[:])
            if any_hit:
                # Occlusion query: once every ray in the packet is blocked
                # there is nothing left to refine.
                @pl.when(jnp.all(bi_ref[:] >= 0))
                def _done():
                    sp_ref[0] = 0
        return 0

    jax.lax.while_loop(cond, body, 0)

    found = bi_ref[:] >= 0
    out_t[:] = jnp.where(found, bt_ref[:], f32(-1.0))
    out_u[:] = bu_ref[:]
    out_v[:] = bv_ref[:]
    out_i[:] = bi_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("first_leaf", "leaf_size", "depth", "cull_backface",
                     "any_hit"))
def _trace_packed(nodes_packed, tris_packed, o, d, t_min, t_max,
                  first_leaf: int, leaf_size: int, depth: int,
                  cull_backface: bool, any_hit: bool = False):
    count = o.shape[0]
    padded = -(-count // BLOCK) * BLOCK
    pad = padded - count

    def prep(x, fill=0.0):
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=fill)
        return x

    o = prep(o)
    d = prep(d, 1.0)
    tmn = prep(jnp.broadcast_to(t_min, (count,)))
    tmx = prep(jnp.broadcast_to(t_max, (count,)), -1.0)  # pad rays miss

    rows = padded // LANES
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmn, tmx]
    comps = [c.reshape(rows, LANES) for c in comps]

    grid = (rows // SUBLANES,)
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel, first_leaf=first_leaf, leaf_size=leaf_size,
        cull_backface=cull_backface, any_hit=any_hit)

    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]
    t, u, v, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full, full] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((depth + 8,), jnp.int32),   # stack
            pltpu.SMEM((1,), jnp.int32),           # stack pointer
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best t
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best u
            pltpu.VMEM((SUBLANES, LANES), jnp.float32),  # best v
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),    # best idx
        ],
    )(nodes_packed, tris_packed, *comps)

    t = t.reshape(-1)[:count]
    u = u.reshape(-1)[:count]
    v = v.reshape(-1)[:count]
    idx = idx.reshape(-1)[:count]
    hit = idx >= 0
    return {"t": t, "tri": idx, "u": u, "v": v, "hit": hit}


def trace_nearest_packet(bvh: BVH, nodes_packed, tris_packed, o, d,
                         t_min, t_max, cull_backface: bool = True,
                         any_hit: bool = False):
    """Packet-traversal nearest hit; same contract as traverse.trace_nearest.

    nodes_packed/tris_packed come from pack_nodes/pack_tris and must match
    `bvh`'s layout (leaf l covers rows [l*leaf_size, (l+1)*leaf_size)).
    With any_hit=True the packet stops once every ray is occluded (shadow
    rays; the result is still exact for "is it blocked within t_max").
    """
    return _trace_packed(nodes_packed, tris_packed, o, d,
                         jnp.asarray(t_min, jnp.float32),
                         jnp.asarray(t_max, jnp.float32),
                         bvh.first_leaf, bvh.leaf_size, bvh.depth,
                         cull_backface, any_hit)


# ---------------------------------------------------------------------------
# Woop-leaf kernel: 128-ray packets, (L, 128) pair tiles, MXU contractions
# ---------------------------------------------------------------------------

PACKET = LANES  # 128 rays per packet; pair matrices are (leaf_size, 128)


def _traverse_kernel_woop(nodes_ref, woop_ref, ox_ref, oy_ref, oz_ref,
                          dx_ref, dy_ref, dz_ref, tmn_ref, tmx_ref,
                          out_t, out_u, out_v, out_i,
                          stack_ref, sp_ref, bt_ref, bu_ref, bv_ref, bi_ref,
                          *, first_leaf: int, leaf_size: int,
                          cull_backface: bool):
    """Packet traversal with Woop-transform leaves (steeljax.accel.woop).

    The kernel block holds 8 sub-packets of 128 rays (one (8, 128) tile per
    ray component); each sub-packet traverses independently with scalar
    stack state in SMEM and (1, 128) best-hit scratch in VMEM.  Leaf
    intersection is two (L, 3) x (3, 128) MXU contractions + dense (L, 128)
    elementwise work; every array keeps lane dim 128 — no layout casts.
    """
    eps = jnp.float32(1e-12)
    big = jnp.float32(3.0e38)

    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (leaf_size, LANES), 0)

    for s in range(SUBLANES):
        ox = ox_ref[s:s + 1, :]       # (1, 128)
        oy = oy_ref[s:s + 1, :]
        oz = oz_ref[s:s + 1, :]
        dx = dx_ref[s:s + 1, :]
        dy = dy_ref[s:s + 1, :]
        dz = dz_ref[s:s + 1, :]
        tmn = tmn_ref[s:s + 1, :]
        tmx = tmx_ref[s:s + 1, :]

        o3 = jnp.concatenate([ox, oy, oz], axis=0)   # (3, 128)
        d3 = jnp.concatenate([dx, dy, dz], axis=0)

        def safe_inv(d):
            return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                   jnp.where(d < 0, -1e-12, 1e-12), d)

        inv_dx = safe_inv(dx)
        inv_dy = safe_inv(dy)
        inv_dz = safe_inv(dz)

        bt_ref[:] = tmx
        bu_ref[:] = jnp.zeros_like(tmx)
        bv_ref[:] = jnp.zeros_like(tmx)
        bi_ref[:] = jnp.full(tmx.shape, -1, jnp.int32)

        stack_ref[0] = 0
        sp_ref[0] = 1

        def cond(_):
            return sp_ref[0] > 0

        def body(_):
            sp = sp_ref[0]
            node = stack_ref[sp - 1]
            sp_ref[0] = sp - 1

            @pl.when(node < first_leaf)
            def _internal():
                for k in range(2):
                    child = 2 * node + 1 + k
                    row = nodes_ref[child]
                    t0x = (row[0] - ox) * inv_dx
                    t1x = (row[3] - ox) * inv_dx
                    t0y = (row[1] - oy) * inv_dy
                    t1y = (row[4] - oy) * inv_dy
                    t0z = (row[2] - oz) * inv_dz
                    t1z = (row[5] - oz) * inv_dz
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z))
                    hit = (near <= far) & (far >= tmn) & (near <= bt_ref[:])

                    @pl.when(jnp.any(hit))
                    def _push():
                        sp2 = sp_ref[0]
                        stack_ref[sp2] = child
                        sp_ref[0] = sp2 + 1

            @pl.when(node >= first_leaf)
            def _leaf():
                base = (node - first_leaf) * leaf_size
                blk = woop_ref[pl.ds(base, leaf_size), :]   # (L, 16)
                r0 = blk[:, 0:3]
                r1 = blk[:, 3:6]
                r2 = blk[:, 6:9]
                b0 = blk[:, 9:10]
                b1 = blk[:, 10:11]
                b2 = blk[:, 11:12]
                ds = blk[:, 12:13]

                def mat(rows, rays):
                    return jax.lax.dot_general(
                        rows, rays,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                ou = mat(r0, o3) - b0                       # (L, 128)
                ov = mat(r1, o3) - b1
                ow = mat(r2, o3) - b2
                du = mat(r0, d3)
                dv = mat(r1, d3)
                dw = mat(r2, d3)

                valid_w = jnp.abs(dw) > eps
                t = -ow / jnp.where(valid_w, dw, 1.0)
                u = ou + t * du
                v = ov + t * dv
                if cull_backface:
                    facing = (dw < -eps) | ((ds > 0.5) & valid_w)
                else:
                    facing = valid_w

                hit = (facing & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t >= tmn) & (t <= bt_ref[:]))
                t_masked = jnp.where(hit, t, big)
                t_best = jnp.min(t_masked, axis=0, keepdims=True)  # (1, 128)
                l_best = jnp.argmin(t_masked, axis=0)              # (128,)
                better = t_best < bt_ref[:]
                onehot = (sub_ids == l_best[None, :]).astype(jnp.float32)
                u_best = jnp.sum(u * onehot, axis=0, keepdims=True)
                v_best = jnp.sum(v * onehot, axis=0, keepdims=True)
                i_best = base + l_best[None, :].astype(jnp.int32)

                bt_ref[:] = jnp.where(better, t_best, bt_ref[:])
                bu_ref[:] = jnp.where(better, u_best, bu_ref[:])
                bv_ref[:] = jnp.where(better, v_best, bv_ref[:])
                bi_ref[:] = jnp.where(better, i_best, bi_ref[:])
            return 0

        jax.lax.while_loop(cond, body, 0)

        found = bi_ref[:] >= 0
        out_t[s:s + 1, :] = jnp.where(found, bt_ref[:], jnp.float32(-1.0))
        out_u[s:s + 1, :] = bu_ref[:]
        out_v[s:s + 1, :] = bv_ref[:]
        out_i[s:s + 1, :] = bi_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("first_leaf", "leaf_size", "depth", "cull_backface"))
def _trace_packed_woop(nodes_packed, woop_packed, o, d, t_min, t_max,
                       first_leaf: int, leaf_size: int, depth: int,
                       cull_backface: bool):
    count = o.shape[0]
    padded = -(-count // BLOCK) * BLOCK
    pad = padded - count

    def prep(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o = prep(o)
    d = prep(d, 1.0)
    tmn = prep(jnp.broadcast_to(t_min, (count,)))
    tmx = prep(jnp.broadcast_to(t_max, (count,)), -1.0)  # pad rays miss

    rows = padded // LANES
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmn, tmx]
    comps = [c.reshape(rows, LANES) for c in comps]

    grid = (rows // SUBLANES,)
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel_woop, first_leaf=first_leaf, leaf_size=leaf_size,
        cull_backface=cull_backface)

    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    ]
    t, u, v, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full, full] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((depth + 8,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.int32),
        ],
    )(nodes_packed, woop_packed, *comps)

    t = t.reshape(-1)[:count]
    u = u.reshape(-1)[:count]
    v = v.reshape(-1)[:count]
    idx = idx.reshape(-1)[:count]
    hit = idx >= 0
    return {"t": t, "tri": idx, "u": u, "v": v, "hit": hit}


def trace_nearest_woop(bvh: BVH, nodes_packed, woop_packed, o, d,
                       t_min, t_max, cull_backface: bool = True):
    """Woop-leaf packet traversal; same contract as traverse.trace_nearest.

    Returns u/v barycentrics from the unit-triangle frame (identical
    semantics to Moller-Trumbore's u/v)."""
    return _trace_packed_woop(nodes_packed, woop_packed, o, d,
                              jnp.asarray(t_min, jnp.float32),
                              jnp.asarray(t_max, jnp.float32),
                              bvh.first_leaf, bvh.leaf_size, bvh.depth,
                              cull_backface)
