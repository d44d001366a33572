"""Streamed-treelet traversal for scenes past the VMEM ceiling.

The chunked path (accel.dispatch) Morton-splits big scenes into
independent BVHs and sweeps EVERY chunk kernel for every packet; on
multi-M-triangle scenes with incoherent bounce rays that is the dominant
cost (measured ~1 s/bounce at 1.6M tris).  The treelet design replaces it
with the TPU analog of persistent-thread ray queues:

* ONE global SAH BVH is cut into ~TREELET_TRIS-triangle subtrees
  ("treelets").  The builder partitions triangles in place, so every
  treelet owns a contiguous slice of the permuted triangle arrays
  (native/bvh_builder.cpp:14-15) — its node/tri tables stack into dense
  (K, S, 128) / (K, R, 128) HBM arrays.
* A fused XLA "top phase" slab-tests every ray against the K treelet
  AABBs (K is small; this is pure elementwise work, no kernel).
* A round loop then schedules PACKETS onto treelets: each packet picks
  the nearest treelet any of its rays still needs, and one Pallas launch
  per round traverses every packet against its chosen treelet — the
  treelet id rides a scalar-prefetch argument whose BlockSpec index_map
  DMAs exactly that treelet's blocks into VMEM (consecutive packets that
  pick the same treelet reuse the resident copy; the integrator's
  spatial ray sort makes such runs long).  Hits shrink each ray's t_max,
  which both prunes later rounds (entry-distance test) and lets the
  kernel's root test reject finished rays in one pop.

The Vulkan reference gets the equivalent scheduling from RT-core MIMD
hardware (traceRayEXT over a driver TLAS); this is the compiler-visible
re-design of that hidden machinery.

MEASURED (TPU v5e, 1.3-1.6M-tri stress scene): 13% SLOWER end-to-end
than the chunk sweep (0.53 vs 0.61 Mray/s on bench.py stress, after the
finished-packet interval-inversion fix; 16% before it).  Trace-only
rounds are competitive on incoherent rays (256k treelets beat one
chunked run), but coherent primaries stay 15-20% slower (the resident
chunk kernel never re-DMAs), and 256k treelets with the fused shade
stack exceed the VMEM pipeline budget.  Kept OPT-IN
(dispatch.prepare_tables treelets=True, or STEELJAX_TREELETS=1) because
the VMEM footprint is O(treelet) not O(chunk): the route for scenes far
past MAX_CHUNK_TRIS, where the chunk sweep degenerates to many
launches, and fused shading (impossible past BIG_CHUNK_ROWS in the
resident kernel) stays available at any scene size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from steeljax.accel import pallas_traverse as ptv
from steeljax.accel.bvh import TRI_PER_ROW, collapse_bvh8, subtree_tri_ranges
from steeljax.core.constants import RAY_DEAD_T

# Target treelet size: tri table 8 MB + nodes, double-buffered by the
# pipeline, leaves headroom under the 128 MB chip VMEM.
TREELET_TRIS = 131_072


@struct.dataclass
class TreeletTables:
    node_stack: jnp.ndarray          # (K, S, 128) f32 BVH8 rows, local ids
    tri_stack: jnp.ndarray           # (K, R, 128) f32 pack_tris slices
    aabb_lo: jnp.ndarray             # (K, 3) f32 treelet bounds
    aabb_hi: jnp.ndarray             # (K, 3)
    tri_offsets: jnp.ndarray         # (K,) i32 global first-triangle index
    shade_stack: jnp.ndarray | None = None  # (K, R*mode, 128) f32
    depth: int = struct.field(pytree_node=False, default=1)
    max_leaf: int = struct.field(pytree_node=False, default=24)
    shade_mode: int = struct.field(pytree_node=False, default=0)
    # tri_stack rows carry AUX-encoded alpha masks (pack_tris with
    # tri_alpha_mask); the kernel decodes/rejects in-traversal.
    alpha_mask: bool = struct.field(pytree_node=False, default=False)
    # Host copy of each treelet's row-aligned triangle range (lo, hi) —
    # attach_shade_stack slices the global shade table by these.
    ranges: tuple = struct.field(pytree_node=False, default=())

    @property
    def count(self) -> int:
        return self.node_stack.shape[0]


def cut_treelets(nodes: np.ndarray, max_tris: int = TREELET_TRIS
                 ) -> tuple[list[int], np.ndarray, np.ndarray]:
    """Pick treelet roots: the shallowest nodes whose subtree holds at
    most `max_tris` triangles.  Returns (roots, range_lo, range_hi) with
    ranges in (row-aligned) permuted-triangle units."""
    nodes = np.asarray(nodes)
    count, lo, hi = subtree_tri_ranges(nodes)
    roots: list[int] = []
    stack = [0]
    while stack:
        i = stack.pop()
        if count[i] <= max_tris or nodes[i, 7] > 0:
            roots.append(i)
        else:
            left = int(nodes[i, 6])
            stack.append(left + 1)
            stack.append(left)
    # Left-first DFS over an in-place-partitioned tree visits treelets in
    # ascending triangle order already.
    return roots, lo[roots], hi[roots]


def build_treelet_tables(nodes: np.ndarray, tris_packed: np.ndarray,
                         max_leaf: int,
                         max_tris: int = TREELET_TRIS) -> TreeletTables:
    """Cut the global binary tree and stack per-treelet BVH8/tri tables.

    `tris_packed` is the GLOBAL pack_tris layout (rows of TRI_PER_ROW
    records); treelet tri tables are row slices of it (contiguous subtree
    ranges).
    """
    nodes = np.asarray(nodes)
    tris_packed = np.asarray(tris_packed)
    roots, lo, hi = cut_treelets(nodes, max_tris)

    rows_list, depths = [], []
    for r, l in zip(roots, lo):
        rows8, depth8 = collapse_bvh8(nodes, max_leaf, root=r)
        # Localize leaf starts (meta0) to the treelet's triangle range so
        # the kernel indexes the DMA'd block directly.
        leaf = rows8[:, 7::16] > 0
        starts = rows8[:, 6::16]
        rows8[:, 6::16] = np.where(leaf, starts - float(l), starts)
        rows_list.append(rows8)
        depths.append(depth8)

    k = len(roots)
    s_max = max(r.shape[0] for r in rows_list)
    node_stack = np.zeros((k, s_max, 128), np.float32)
    # Unreachable padding rows; mark children empty anyway.
    node_stack[:, :, 6::16] = -1.0
    node_stack[:, :, 3::16] = -3.0e37
    for i, r in enumerate(rows_list):
        node_stack[i, :r.shape[0]] = r

    r_max = int(max((h - l) // TRI_PER_ROW for l, h in zip(lo, hi)))
    tri_stack = np.zeros((k, r_max, 128), np.float32)
    for i, (l, h) in enumerate(zip(lo, hi)):
        tri_stack[i, :(h - l) // TRI_PER_ROW] = \
            tris_packed[l // TRI_PER_ROW:h // TRI_PER_ROW]

    aabb_lo = nodes[roots, 0:3].astype(np.float32)
    aabb_hi = nodes[roots, 3:6].astype(np.float32)
    return TreeletTables(
        node_stack=jnp.asarray(node_stack),
        tri_stack=jnp.asarray(tri_stack),
        aabb_lo=jnp.asarray(aabb_lo),
        aabb_hi=jnp.asarray(aabb_hi),
        tri_offsets=jnp.asarray(np.asarray(lo, np.int32)),
        depth=max(depths), max_leaf=max_leaf,
        ranges=tuple((int(l), int(h)) for l, h in zip(lo, hi)))


def attach_shade_stack(tt: TreeletTables, shade_packed: np.ndarray,
                       shade_mode: int) -> TreeletTables:
    """Stack per-treelet slices of the GLOBAL pack_shade_records table
    (same permuted order as the triangles, `per` rows per triangle row).
    Rows past each treelet's real range are padding the leaf loops never
    read (leaf row reads are count-gated)."""
    per = 1 if shade_mode == 1 else ptv.SHADE2_ROWS_PER_TRI_ROW
    shade_packed = np.asarray(shade_packed)
    k = tt.count
    r_max = tt.tri_stack.shape[1]
    stack = np.zeros((k, r_max * per, 128), np.float32)
    for i, (lo, hi) in enumerate(tt.ranges):
        rows = (hi - lo) // TRI_PER_ROW * per
        srow0 = lo // TRI_PER_ROW * per
        stack[i, :rows] = shade_packed[srow0:srow0 + rows]
    return tt.replace(shade_stack=jnp.asarray(stack),
                      shade_mode=shade_mode)


def _entry_distances(tt: TreeletTables, o, d, t_min, t_max):
    """(N, K) slab entry distance per (ray, treelet); +inf when the ray
    cannot hit it inside [t_min, t_max].  Pure fused elementwise work."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    o = o[:, None, :]
    inv = inv[:, None, :]
    t0 = (tt.aabb_lo[None] - o) * inv
    t1 = (tt.aabb_hi[None] - o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    possible = (near <= far) & (far >= t_min[:, None]) \
        & (near <= t_max[:, None])
    return jnp.where(possible, near, jnp.inf)


def _next_pid(entry, visited, t_far, block):
    """Per-ray nearest wanted treelet -> per-packet NEAREST choice (the
    treelet whose entry distance is the packet-wide minimum, so hits
    shrink t_far before farther treelets are considered).

    Returns (P,) int32 in [0, K]; K means the packet is done."""
    k = entry.shape[1]
    masked = jnp.where(visited | (entry >= t_far[:, None]), jnp.inf, entry)
    best = jnp.min(masked, axis=1)
    desired = jnp.argmin(masked, axis=1).astype(jnp.int32)
    desired = jnp.where(jnp.isfinite(best), desired, jnp.int32(k))
    # Packet pick = the desired treelet of the packet's nearest-entry ray
    # (an all-done packet's argmin ray has best=inf, hence desired=K).
    best_p = best.reshape(-1, block)
    desired_p = desired.reshape(-1, block)
    ray_ix = jnp.argmin(best_p, axis=1)
    return jnp.take_along_axis(desired_p, ray_ix[:, None], axis=1)[:, 0]


def trace_treelets(tt: TreeletTables, o, d, t_min, t_max,
                   cull_backface: bool = True, any_hit: bool = False,
                   packet_sublanes: int = ptv.SUBLANES,
                   trace_fn=None):
    """Nearest-hit (or any-hit) trace through the treelet scheduler.

    Same record contract as trace_nearest_packet8 (global triangle ids;
    fused shade fields when tt.shade_mode > 0).  `trace_fn` overrides the
    Pallas round kernel — CPU tests inject a reference intersector to
    exercise the scheduling loop without TPU hardware.
    """
    n = o.shape[0]
    block = ptv.LANES * packet_sublanes
    padded = -(-n // block) * block
    pad = padded - n

    def prep(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o = prep(jnp.asarray(o, jnp.float32))
    d = prep(jnp.asarray(d, jnp.float32), 1.0)
    t_min = prep(jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,)))
    t_far = prep(jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,)),
                 RAY_DEAD_T)

    k = tt.count
    shade_mode = tt.shade_mode if not any_hit else 0
    entry = _entry_distances(tt, o, d, t_min, t_far)
    visited = ~jnp.isfinite(entry)

    if trace_fn is None:
        trace_fn = functools.partial(
            ptv._trace_packed8_treelet, tt.node_stack, tt.tri_stack,
            max_leaf=tt.max_leaf, depth=tt.depth,
            cull_backface=cull_backface, any_hit=any_hit,
            packet_sublanes=packet_sublanes,
            shade_stack=tt.shade_stack if shade_mode else None,
            shade_mode=shade_mode, alpha_mask=tt.alpha_mask)

    rec = {"t": jnp.full((padded,), -1.0, jnp.float32),
           "tri": jnp.full((padded,), -1, jnp.int32),
           "u": jnp.zeros((padded,), jnp.float32),
           "v": jnp.zeros((padded,), jnp.float32),
           "hit": jnp.zeros((padded,), bool)}
    if shade_mode:
        rec["n"] = jnp.zeros((padded, 3), jnp.float32)
        rec["mat"] = jnp.zeros((padded,), jnp.int32)
    if shade_mode == 2:
        rec["tan"] = jnp.zeros((padded, 3), jnp.float32)
        rec["uv"] = jnp.zeros((padded, 2), jnp.float32)
        rec["uvd"] = jnp.zeros((padded,), jnp.float32)

    pid0 = _next_pid(entry, visited, t_far, block)
    carry0 = (rec, t_far, visited, pid0, jnp.int32(0))

    def cond(carry):
        _, _, _, pid, rounds = carry
        # Every round retires >= 1 treelet per live packet (visited
        # masking), so K rounds is an exact upper bound — the backstop
        # can never drop hits, whatever the cut size.
        return jnp.any(pid < k) & (rounds < k)

    def body(carry):
        rec, t_far, visited, pid, rounds = carry
        pid_safe = jnp.minimum(pid, k - 1)
        # Finished packets (pid == k) still launch against treelet k-1;
        # an inverted interval makes the kernel root-reject their rays in
        # one pop instead of paying a full traversal every later round.
        done_ray = jnp.repeat(pid >= k, block)
        rk = trace_fn(pid_safe, o, d, t_min,
                      jnp.where(done_ray, RAY_DEAD_T, t_far))
        # Treelet-local -> global triangle ids (per-packet offset).
        off = jnp.repeat(jnp.take(tt.tri_offsets, pid_safe), block)
        rk = dict(rk)
        rk["tri"] = jnp.where(rk["hit"], rk["tri"] + off, -1)

        if any_hit:
            hit = rec["hit"] | rk["hit"]
            rec2 = dict(rec)
            rec2["hit"] = hit
            # Occluded rays stop scheduling (and root-reject in-kernel).
            t_far = jnp.where(hit, RAY_DEAD_T, t_far)
        else:
            better = rk["hit"] & (~rec["hit"] | (rk["t"] < rec["t"]))
            rec2 = {key: jnp.where(
                better if rec[key].ndim == 1 else better[:, None],
                rk[key], rec[key]) for key in rec}
            t_far = jnp.where(better, rk["t"], t_far)

        pid_ray = jnp.repeat(pid_safe, block)
        visited = visited | (pid_ray[:, None]
                             == jnp.arange(k, dtype=jnp.int32)[None, :])
        pid_next = _next_pid(entry, visited, t_far, block)
        return rec2, t_far, visited, pid_next, rounds + 1

    rec, _, _, _, _ = jax.lax.while_loop(cond, body, carry0)
    return {key: val[:n] for key, val in rec.items()}
