"""Trace dispatch: one ray-query interface over backends and scene scale.

The Vulkan reference calls traceRayEXT and lets the driver pick the
hardware path; steeljax's equivalent picks between:

* the Pallas BVH8 packet kernel (TPU — steeljax.accel.pallas_traverse), and
* the vmapped binary-BVH stack traversal (CPU / interpret),

decided once at scene-preparation time and baked into the TraceTables
pytree as a static field (so jit specializes, like a shader define).

Scenes larger than the VMEM budget split into *chunks*: triangles are
globally Morton-ordered, cut into contiguous ranges, and each range gets
its own BVH; a trace runs the chunks sequentially, shrinking t_max with
the best hit so far (early culling).  Chunk count is static, so the whole
thing stays one jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from steeljax.accel import traverse
from steeljax.accel import pallas_traverse as ptv
from steeljax.accel.bvh import BVH, BVH8, _morton3, build_bvh, collapse_bvh8

# VMEM budget per chunk: tris_packed is 64 B/tri; leave room for rays,
# outputs, and the supernode table.
MAX_CHUNK_TRIS = 1_200_000


@struct.dataclass
class ChunkTables:
    bvh: BVH                    # binary tree (CPU path + stats)
    bvh8: BVH8                  # supernode rows (TPU path)
    tris_packed: jnp.ndarray    # flat lane layout (pack_tris), chunk-local
    row_offset: int = struct.field(pytree_node=False, default=0)
    rows: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class TraceTables:
    chunks: tuple  # tuple[ChunkTables, ...]
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    @property
    def bvh(self) -> BVH:  # convenience for single-chunk callers
        return self.chunks[0].bvh

    @property
    def bvh8(self) -> BVH8:
        return self.chunks[0].bvh8

    @property
    def tris_packed(self):
        return self.chunks[0].tris_packed


def backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # no devices at all
        return False


def prepare_tables(tri_pos, tri_double_sided, leaf_size: int = 24,
                   max_chunk: int | None = None,
                   use_pallas: bool | None = None, method: str = "auto"
                   ) -> tuple["TraceTables", np.ndarray, int]:
    """Build (possibly chunked) acceleration tables.

    Returns (tables, global_order, total_padded): reorder every
    per-triangle array by global_order (entries of -1 are pad slots) and
    pad to total_padded — bvh.apply_permutation does both.
    """
    if use_pallas is None:
        use_pallas = backend_is_tpu()
    if max_chunk is None:
        max_chunk = MAX_CHUNK_TRIS
    tri_pos = np.asarray(tri_pos, np.float32)
    ds = np.asarray(tri_double_sided)
    count = len(tri_pos)

    if count <= max_chunk:
        pieces = [np.arange(count, dtype=np.int64)]
    else:
        centroids = tri_pos.mean(axis=1)
        lo = centroids.min(axis=0)
        extent = np.maximum(centroids.max(axis=0) - lo, 1e-9)
        q = np.clip((centroids - lo) / extent * 1023.0,
                    0, 1023).astype(np.uint32)
        order = np.argsort(_morton3(q), kind="stable").astype(np.int64)
        n_chunks = -(-count // max_chunk)
        pieces = np.array_split(order, n_chunks)

    chunks = []
    order_parts = []
    offset = 0
    for piece in pieces:
        sub_pos = tri_pos[piece] if count else tri_pos
        sub_ds = ds[piece] if count else ds
        bvh, sub_order, padded = build_bvh(sub_pos, leaf_size, method)
        # Map chunk-local order (with -1 pads) back to global ids.
        if len(piece):
            global_part = np.where(
                sub_order >= 0, piece[np.clip(sub_order, 0, None)], -1)
        else:
            global_part = sub_order
        order_parts.append(global_part)
        permuted_pos = np.full((padded, 3, 3), 3.0e37, np.float32)
        permuted_ds = np.zeros(padded, bool)
        if len(sub_order):
            real = sub_order >= 0
            permuted_pos[np.nonzero(real)[0]] = sub_pos[sub_order[real]]
            permuted_ds[np.nonzero(real)[0]] = sub_ds[sub_order[real]]
        rows8, depth8 = collapse_bvh8(np.asarray(bvh.nodes), leaf_size)
        chunks.append(ChunkTables(
            bvh=bvh,
            bvh8=BVH8(rows=jnp.asarray(rows8), depth=depth8,
                      max_leaf=leaf_size),
            tris_packed=jnp.asarray(ptv.pack_tris(permuted_pos,
                                                  permuted_ds)),
            row_offset=offset, rows=padded))
        offset += padded

    global_order = (np.concatenate(order_parts) if order_parts
                    else np.zeros(0, np.int64))
    tables = TraceTables(chunks=tuple(chunks), use_pallas=bool(use_pallas))
    return tables, global_order, offset


def make_trace_tables(bvh: BVH, tri_pos, tri_double_sided,
                      use_pallas: bool | None = None) -> TraceTables:
    """Single-chunk tables from an existing BVH + permuted arrays (used by
    tests and small scenes)."""
    if use_pallas is None:
        use_pallas = backend_is_tpu()
    rows, depth8 = collapse_bvh8(np.asarray(bvh.nodes), bvh.max_leaf)
    chunk = ChunkTables(
        bvh=bvh,
        bvh8=BVH8(rows=jnp.asarray(rows), depth=depth8,
                  max_leaf=bvh.max_leaf),
        tris_packed=jnp.asarray(
            ptv.pack_tris(np.asarray(tri_pos),
                          np.asarray(tri_double_sided))),
        row_offset=0, rows=len(np.asarray(tri_pos)))
    return TraceTables(chunks=(chunk,), use_pallas=bool(use_pallas))


def _chunk_slice(arr, chunk: ChunkTables):
    return jax.lax.slice_in_dim(arr, chunk.row_offset,
                                chunk.row_offset + chunk.rows, axis=0)


def trace_nearest(tables: TraceTables, tri_pos, tri_double_sided, o, d,
                  t_min, t_max, cull_backface: bool = True):
    best = None
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    for chunk in tables.chunks:
        if tables.use_pallas:
            rec = ptv.trace_nearest_packet8(
                chunk.bvh8, chunk.tris_packed, o, d, t_min, tmax,
                cull_backface=cull_backface)
        else:
            rec = traverse.trace_nearest(
                chunk.bvh, _chunk_slice(tri_pos, chunk),
                _chunk_slice(tri_double_sided, chunk), o, d, t_min, tmax,
                cull_backface=cull_backface)
        rec = dict(rec)
        rec["tri"] = jnp.where(rec["hit"], rec["tri"] + chunk.row_offset,
                               -1)
        if best is None:
            best = rec
        else:
            better = rec["hit"] & (~best["hit"] | (rec["t"] < best["t"]))
            best = {k: jnp.where(better, rec[k], best[k]) for k in best}
        # Shrink the interval: later chunks only need closer hits.
        tmax = jnp.where(best["hit"], best["t"], tmax)
    return best


def trace_any(tables: TraceTables, tri_pos, tri_double_sided, o, d,
              t_min, t_max):
    occluded = None
    for chunk in tables.chunks:
        if tables.use_pallas:
            rec = ptv.trace_nearest_packet8(
                chunk.bvh8, chunk.tris_packed, o, d, t_min, t_max,
                cull_backface=False, any_hit=True)
            hit = rec["hit"]
        else:
            hit = traverse.trace_any(
                chunk.bvh, _chunk_slice(tri_pos, chunk),
                _chunk_slice(tri_double_sided, chunk), o, d, t_min, t_max)
        occluded = hit if occluded is None else (occluded | hit)
    return occluded
