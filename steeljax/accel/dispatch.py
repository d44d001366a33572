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

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# A/B knob: cap the fused-shading mode of nearest traces
# (STEELJAX_SHADE_MODE=0|1 caps; unset = use the tables' mode).  The
# fused leaf-loop attribute interpolation pays per CANDIDATE hit, the
# post-trace shade_rows gather per RAY — which side wins depends on the
# candidate multiplicity of the workload.
_env_mode = os.environ.get("STEELJAX_SHADE_MODE")
_SHADE_MODE_OVERRIDE = int(_env_mode) if _env_mode is not None else None

from steeljax.accel import traverse
from steeljax.accel import pallas_traverse as ptv
from steeljax.accel.bvh import BVH, BVH8, _morton3, build_bvh, collapse_bvh8
from steeljax.core.constants import RAY_DEAD_T

# VMEM budget per chunk: tris_packed is 42.7 B/tri (12 records per
# 128-lane row — bvh.TRI_PER_ROW); leave room for rays, outputs, and the
# supernode table.  The previous 8 x 16 packing (64 B/tri) capped chunks
# at 1.2M tris; the denser rows lift the San Miguel-class stress scene
# (1.58M tris) into a SINGLE resident chunk — no per-bounce chunk sweep.
MAX_CHUNK_TRIS = 1_900_000
# Streamed treelets (accel.treelets) are OPT-IN (prepare_tables
# treelets=True): measured 16% slower than the chunk sweep at 1.3-1.6M
# tris (0.51 vs 0.60 Mray/s end-to-end; insensitive to treelet size
# 64k/131k/256k and packet size) because the per-packet treelet union
# does not shrink — same floor as the resident kernel.  Kept because it
# is the only path whose VMEM footprint is O(treelet), not O(chunk):
# use it for scenes so large the chunk sweep degenerates (>>MAX_CHUNK_TRIS).
# Ceiling for the treelets' double-buffered (nodes + tris + shade) VMEM
# block when attaching fused shading (chip VMEM 128 MB; rays/outputs and
# scratch need the rest).  131k-tri treelets + mode-1 shade fit; 262k do
# not (measured spill).
TREELET_SHADE_VMEM_BUDGET = 100 * 1024 * 1024
# Chunks above this row count are traced with halved packets (deep trees
# are leaf-VPU-bound on incoherent packets) and skip the fused shade
# tables (tris+shade past this spills scoped VMEM and collapses the
# kernel — measured 23 -> 0.4 Mray/s on the 1.6M-tri stress scene).
BIG_CHUNK_ROWS = 400_000
SUBLANES_BIG = 16
# Screen-coherent traces (primary/shadow/forward-peel rays in tile
# order) want SMALLER packets on mid/large scenes: a 16-sublane packet
# is a tighter screen tile, so its union frustum sweeps ~half the leaf
# rows per ray (hybrid-bench primary 61.9 -> 55.8 ms, sun shadow 78.4 ->
# 69.4 ms, on-chip round 4; /tmp/subl2.log).  Small scenes (Cornell) pop
# so few rows the per-packet floor dominates and 32 stands; incoherent
# bounce packets keep the BIG_CHUNK_ROWS rule (unions do not shrink).
SUBLANES_COHERENT = 16
COHERENT_MIN_ROWS = 100_000


@struct.dataclass
class ChunkTables:
    bvh: BVH                    # binary tree (CPU path + stats)
    bvh8: BVH8                  # supernode rows (TPU path)
    tris_packed: jnp.ndarray    # flat lane layout (pack_tris), chunk-local
    # Fused-shading records (pack_shade_records), chunk-local; None until
    # attach_shade_tables is called.
    shade_packed: jnp.ndarray | None = None
    # Chunk-local conservative alpha-coverage masks (accel.alphamask),
    # (rows,) uint32: consumed by the CPU oracle path; the Pallas kernel
    # reads the same bits from the AUX lane of tris_packed.  Host numpy on
    # the TPU path (jit prunes unused args — never uploaded).
    tri_mask: jnp.ndarray | None = None
    # Two-plane fine mask rows ((rows/12, 128) int32,
    # pallas_traverse.pack_fine_mask_rows) for the multi-hit alpha path:
    # +42.7 B/tri of VMEM, built only for alpha-masked Pallas chunks.
    fine_mask_rows: jnp.ndarray | None = None
    # Dense 14-record any-hit tables (pack_tris_dense + a re-aligned
    # supernode collapse): occlusion queries need no ds/aux/shade, so
    # shadow rays visit 14.3% fewer leaf rows.  Non-alpha Pallas chunks
    # only; the any-hit kernel binds ONLY these (VMEM is per-call
    # scoped), so they never compete with the nearest tables.
    anyhit_bvh8: BVH8 | None = None
    anyhit_tris: jnp.ndarray | None = None
    row_offset: int = struct.field(pytree_node=False, default=0)
    rows: int = struct.field(pytree_node=False, default=0)
    # Chunk AABB (static floats) for the per-ray pre-cull.
    aabb: tuple = struct.field(pytree_node=False,
                               default=((0.0,) * 3, (0.0,) * 3))


@struct.dataclass
class TraceTables:
    chunks: tuple  # tuple[ChunkTables, ...]
    # Streamed-treelet tables (accel.treelets), set when prepare_tables
    # was called with treelets=True; the single chunk is kept (bvh + aabb
    # metadata, no packed tables) for the CPU backend, validation, and
    # the integrator's bounds/size queries.
    treelets: object | None = None
    use_pallas: bool = struct.field(pytree_node=False, default=False)
    # 0 = trace only; 1 = fuse (normal, mat id) into the kernel;
    # 2 = also (tangent, uv).  See pallas_traverse.pack_shade_records.
    shade_mode: int = struct.field(pytree_node=False, default=0)
    # Triangle records carry AUX-encoded alpha-coverage masks
    # (prepare_tables tri_alpha_mask): traversal rejects provably-
    # transparent candidates in-kernel (AnyHit.rahit:25-52 analog).
    alpha_masked: bool = struct.field(pytree_node=False, default=False)

    @property
    def bvh(self) -> BVH:  # convenience for single-chunk callers
        return self.chunks[0].bvh

    @property
    def bvh8(self) -> BVH8:
        return self.chunks[0].bvh8

    @property
    def tris_packed(self):
        return self.chunks[0].tris_packed


def _dense_anyhit_enabled() -> bool:
    """A/B knob for the dense shadow tables.  Default OFF until the
    on-chip parity variant (flat_anyhit_dense) and the hybrid A/B land;
    flipped in the commit that records them."""
    return os.environ.get("STEELJAX_DENSE_ANYHIT", "0") == "1"


def backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # no devices at all
        return False


def _default_snode_width() -> int:
    """Supernode arity for the flat packet kernel: 8 (16-lane child
    stride) or 16 (8-lane stride, zero pad — half the node VMEM and half
    the scalar pops per ray).  Env override STEELJAX_BVH_WIDTH for A/B."""
    import os
    return int(os.environ.get("STEELJAX_BVH_WIDTH", "8"))


def prepare_tables(tri_pos, tri_double_sided, leaf_size: int = 24,
                   max_chunk: int | None = None,
                   use_pallas: bool | None = None, method: str = "auto",
                   treelets: bool | None = None,
                   tri_alpha_mask: np.ndarray | None = None,
                   tri_fine_mask: np.ndarray | None = None,
                   snode_width: int | None = None
                   ) -> tuple["TraceTables", np.ndarray, int]:
    """Build (possibly chunked) acceleration tables.

    Returns (tables, global_order, total_padded): reorder every
    per-triangle array by global_order (entries of -1 are pad slots) and
    pad to total_padded — bvh.apply_permutation does both.

    `treelets=True` builds the streamed-treelet tables instead of the
    chunk sweep (see the note above TraceTables.treelets); the default
    comes from the STEELJAX_TREELETS env var (off).

    `tri_alpha_mask` ((T,) uint32, accel.alphamask.compute_alpha_masks)
    bakes conservative alpha-coverage bits into the triangle records so
    traversal rejects sub-cutoff alpha-test hits without leaving the
    kernel (the reference's any-hit shader, AnyHit.rahit:25-52); the
    integrator's exact bounded re-trace remains the authority for
    boundary cells.
    """
    if treelets is None:
        import os
        treelets = os.environ.get("STEELJAX_TREELETS", "0") == "1"
    if use_pallas is None:
        use_pallas = backend_is_tpu()
    if snode_width is None:
        snode_width = _default_snode_width()
    if max_chunk is None:
        max_chunk = MAX_CHUNK_TRIS
    tri_pos = np.asarray(tri_pos, np.float32)
    ds = np.asarray(tri_double_sided)
    count = len(tri_pos)
    from steeljax.accel.alphamask import MASK_FULL
    mask = (None if tri_alpha_mask is None
            else np.asarray(tri_alpha_mask, np.uint32))
    if mask is not None and count and int(mask.min()) == MASK_FULL:
        mask = None  # every triangle fully covered: masking is a no-op
    # Fine two-plane rows ride along only when coarse masking is live
    # (same gate: all-covered scenes need neither) and the Pallas path
    # will consume them.  `tri_fine_mask` is (T, FINE_STRIDE) int32 from
    # alphamask.compute_fine_masks.
    fine = (np.asarray(tri_fine_mask, np.int32)
            if (tri_fine_mask is not None and mask is not None
                and use_pallas) else None)

    if treelets and use_pallas:
        return _prepare_treelet_tables(tri_pos, ds, leaf_size, method,
                                       tri_alpha_mask=mask)

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
        permuted_mask = (np.zeros(padded, np.uint32)
                         if mask is not None else None)
        permuted_fine = (np.zeros((padded, fine.shape[1]), np.int32)
                         if fine is not None else None)
        if len(sub_order):
            real = sub_order >= 0
            permuted_pos[np.nonzero(real)[0]] = sub_pos[sub_order[real]]
            permuted_ds[np.nonzero(real)[0]] = sub_ds[sub_order[real]]
            if mask is not None:
                sub_mask = mask[piece] if count else mask
                permuted_mask[np.nonzero(real)[0]] = \
                    sub_mask[sub_order[real]]
            if fine is not None:
                sub_fine = fine[piece] if count else fine
                permuted_fine[np.nonzero(real)[0]] = \
                    sub_fine[sub_order[real]]
        rows8, depth8 = collapse_bvh8(np.asarray(bvh.nodes), leaf_size,
                                      width=snode_width)
        # Dense any-hit tables (non-alpha Pallas chunks): re-align the
        # same binary tree's leaves to DENSE_PER_ROW and pack ds-less
        # 9-float records — shadow rays then read 14 records per row.
        anyhit_bvh8 = None
        anyhit_tris = None
        if use_pallas and mask is None and _dense_anyhit_enabled():
            from steeljax.accel.bvh import _align_leaves
            dnodes, dorder, dpadded = _align_leaves(
                np.asarray(bvh.nodes), sub_order, leaf_size,
                align=ptv.DENSE_PER_ROW)
            dense_pos = np.full((dpadded, 3, 3), 3.0e37, np.float32)
            dreal = dorder >= 0
            if len(dorder):
                dense_pos[np.nonzero(dreal)[0]] = sub_pos[dorder[dreal]]
            drows8, ddepth8 = collapse_bvh8(dnodes, leaf_size,
                                            width=snode_width)
            anyhit_bvh8 = BVH8(rows=jnp.asarray(drows8), depth=ddepth8,
                               max_leaf=leaf_size, width=snode_width)
            anyhit_tris = jnp.asarray(ptv.pack_tris_dense(dense_pos))
        if len(piece):
            real_pos = sub_pos.reshape(-1, 3)
            lo = tuple(float(v) for v in real_pos.min(axis=0))
            hi = tuple(float(v) for v in real_pos.max(axis=0))
        else:
            lo, hi = (0.0,) * 3, (0.0,) * 3
        chunks.append(ChunkTables(
            bvh=bvh,
            bvh8=BVH8(rows=jnp.asarray(rows8), depth=depth8,
                      max_leaf=leaf_size, width=snode_width),
            tris_packed=jnp.asarray(
                ptv.pack_tris(permuted_pos, permuted_ds,
                              tri_alpha_mask=permuted_mask)),
            tri_mask=(None if permuted_mask is None
                      else (permuted_mask if use_pallas
                            else jnp.asarray(permuted_mask.astype(
                                np.int32)))),
            fine_mask_rows=(None if permuted_fine is None
                            else jnp.asarray(ptv.pack_fine_mask_rows(
                                permuted_fine))),
            anyhit_bvh8=anyhit_bvh8, anyhit_tris=anyhit_tris,
            row_offset=offset, rows=padded, aabb=(lo, hi)))
        offset += padded

    global_order = (np.concatenate(order_parts) if order_parts
                    else np.zeros(0, np.int64))
    tables = TraceTables(chunks=tuple(chunks), use_pallas=bool(use_pallas),
                         alpha_masked=mask is not None)
    return tables, global_order, offset


def _prepare_treelet_tables(tri_pos, ds, leaf_size: int, method: str,
                            tri_alpha_mask: np.ndarray | None = None
                            ) -> tuple["TraceTables", np.ndarray, int]:
    """One global SAH BVH cut into streamed treelets (accel.treelets).

    The kept chunk carries metadata only (binary bvh for validation /
    stats, row count, scene AABB) — no packed tables upload; the kernel
    reads the per-treelet stacks."""
    from steeljax.accel.treelets import build_treelet_tables
    bvh, order, padded = build_bvh(tri_pos, leaf_size, method)
    permuted_pos = np.full((padded, 3, 3), 3.0e37, np.float32)
    permuted_ds = np.zeros(padded, bool)
    permuted_mask = (np.zeros(padded, np.uint32)
                     if tri_alpha_mask is not None else None)
    real = order >= 0
    permuted_pos[np.nonzero(real)[0]] = tri_pos[order[real]]
    permuted_ds[np.nonzero(real)[0]] = ds[order[real]]
    if tri_alpha_mask is not None:
        permuted_mask[np.nonzero(real)[0]] = tri_alpha_mask[order[real]]
    packed = ptv.pack_tris(permuted_pos, permuted_ds,
                           tri_alpha_mask=permuted_mask)  # host numpy
    treelets = build_treelet_tables(np.asarray(bvh.nodes), packed,
                                    leaf_size)
    if tri_alpha_mask is not None:
        treelets = treelets.replace(alpha_mask=True)
    real_pos = tri_pos.reshape(-1, 3)
    aabb = (tuple(float(v) for v in real_pos.min(axis=0)),
            tuple(float(v) for v in real_pos.max(axis=0)))
    chunk = ChunkTables(bvh=bvh, bvh8=None, tris_packed=None,
                        tri_mask=permuted_mask,
                        row_offset=0, rows=padded, aabb=aabb)
    tables = TraceTables(chunks=(chunk,), treelets=treelets,
                         use_pallas=True,
                         alpha_masked=tri_alpha_mask is not None)
    return tables, order, padded


def make_trace_tables(bvh: BVH, tri_pos, tri_double_sided,
                      use_pallas: bool | None = None,
                      snode_width: int | None = None) -> TraceTables:
    """Single-chunk tables from an existing BVH + permuted arrays (used by
    tests and small scenes)."""
    if use_pallas is None:
        use_pallas = backend_is_tpu()
    if snode_width is None:
        snode_width = _default_snode_width()
    rows, depth8 = collapse_bvh8(np.asarray(bvh.nodes), bvh.max_leaf,
                                 width=snode_width)
    chunk = ChunkTables(
        bvh=bvh,
        bvh8=BVH8(rows=jnp.asarray(rows), depth=depth8,
                  max_leaf=bvh.max_leaf, width=snode_width),
        tris_packed=jnp.asarray(
            ptv.pack_tris(np.asarray(tri_pos),
                          np.asarray(tri_double_sided))),
        row_offset=0, rows=len(np.asarray(tri_pos)))
    return TraceTables(chunks=(chunk,), use_pallas=bool(use_pallas))


def attach_shade_tables(tables: TraceTables, tri_nrm, tri_tan, tri_uv,
                        tri_mat, textured: bool,
                        tri_uvd=None) -> TraceTables:
    """Build per-chunk fused-shading record tables from PERMUTED per-
    triangle arrays (the ones matching the BVH leaf order, padded to the
    total row count returned by prepare_tables).  Enables the fused
    trace+shade kernel path (shade_mode 1/2)."""
    if not tables.use_pallas:
        return tables
    mode = 2 if textured else 1
    if tables.treelets is not None:
        # Streamed treelets DMA per-treelet blocks, so fused shading fits
        # at ANY scene size (the resident kernel had to drop it past
        # BIG_CHUNK_ROWS and pay the post-trace row gather) — provided
        # the double-buffered (nodes + tris + shade) block stays inside
        # the VMEM pipeline budget (262k-tri treelets + shade measured a
        # spill); otherwise keep the post-trace gather path.
        from steeljax.accel.treelets import attach_shade_stack
        tt = tables.treelets
        per = 1 if mode == 1 else ptv.SHADE2_ROWS_PER_TRI_ROW
        block_bytes = 4 * 128 * (tt.node_stack.shape[1]
                                 + tt.tri_stack.shape[1] * (1 + per))
        if 2 * block_bytes > TREELET_SHADE_VMEM_BUDGET:
            return tables
        packed = ptv.pack_shade_records(
            np.asarray(tri_nrm), np.asarray(tri_tan), np.asarray(tri_uv),
            np.asarray(tri_mat), textured,
            tri_uvd=None if tri_uvd is None else np.asarray(tri_uvd))
        treelets = attach_shade_stack(tables.treelets, packed, mode)
        return tables.replace(treelets=treelets, shade_mode=mode)
    # The shade table shares chunk VMEM with tris_packed (+42.7 B/tri in
    # mode 1, +128 B/tri in mode 2); past BIG_CHUNK_ROWS the combined
    # footprint spills VMEM and the kernel collapses.  Huge chunks keep
    # the gather path, whose fixed ~12 ns/ray cost is small next to their
    # trace.
    if max(chunk.rows for chunk in tables.chunks) > BIG_CHUNK_ROWS:
        return tables
    tri_nrm = np.asarray(tri_nrm)
    tri_tan = np.asarray(tri_tan)
    tri_uv = np.asarray(tri_uv)
    tri_mat = np.asarray(tri_mat)
    tri_uvd = None if tri_uvd is None else np.asarray(tri_uvd)
    chunks = []
    for chunk in tables.chunks:
        s = slice(chunk.row_offset, chunk.row_offset + chunk.rows)
        packed = ptv.pack_shade_records(
            tri_nrm[s], tri_tan[s], tri_uv[s], tri_mat[s], textured,
            tri_uvd=None if tri_uvd is None else tri_uvd[s])
        chunks.append(chunk.replace(shade_packed=jnp.asarray(packed)))
    return tables.replace(chunks=tuple(chunks),
                          shade_mode=2 if textured else 1)


def _chunk_slice(arr, chunk: ChunkTables):
    return jax.lax.slice_in_dim(arr, chunk.row_offset,
                                chunk.row_offset + chunk.rows, axis=0)


def _chunk_interval(chunk: ChunkTables, o, d, t_min, t_max):
    """Per-ray slab test against the chunk AABB: rays that cannot hit the
    chunk get an inverted interval (the kernel rejects them at the root in
    one pop), and a chunk no ray can reach is skipped entirely via
    lax.cond.  This is the packet pre-cull for chunked (multi-M-triangle)
    scenes — without it every chunk kernel pays a root test per packet."""
    lo, hi = chunk.aabb
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d < 0, -1e-12, 1e-12), d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    possible = (near <= far) & (far >= t_min) & (near <= t_max)
    return jnp.where(possible, t_max, RAY_DEAD_T), jnp.any(possible)


def _skippable(fn, any_possible, template):
    """Run `fn()` unless no ray can hit the chunk (lax.cond skip)."""
    return jax.lax.cond(any_possible, lambda _: fn(),
                        lambda _: template, 0)


def trace_nearest(tables, tri_pos, tri_double_sided, o, d,
                  t_min, t_max, cull_backface: bool = True,
                  shared_origin: bool = False, coherent: bool = False):
    # Two-level instanced tables answer the same query; callers (hybrid
    # stages, GI bakes) stay backend-agnostic.
    from steeljax.accel.instances import (InstancedTables,
                                          trace_nearest_instanced)
    if isinstance(tables, InstancedTables):
        return trace_nearest_instanced(tables, o, d, t_min, t_max,
                                       cull_backface=cull_backface)
    if tables.treelets is not None:
        from steeljax.accel.treelets import trace_treelets
        return trace_treelets(tables.treelets, o, d, t_min, t_max,
                              cull_backface=cull_backface)
    best = None
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o.shape[:1])
    multi = len(tables.chunks) > 1
    for chunk in tables.chunks:
        if multi:
            chunk_tmax, any_possible = _chunk_interval(chunk, o, d, tmin,
                                                       tmax)
        else:
            chunk_tmax = tmax

        mode = tables.shade_mode if tables.use_pallas else 0
        if _SHADE_MODE_OVERRIDE is not None and tables.use_pallas:
            mode = min(mode, _SHADE_MODE_OVERRIDE)

        def run(chunk=chunk, chunk_tmax=chunk_tmax):
            if tables.use_pallas:
                # Deep trees are leaf-VPU-bound on incoherent packets;
                # halving the packet trims wasted lane work ~10%.
                subl = (SUBLANES_BIG if chunk.rows > BIG_CHUNK_ROWS
                        else ptv.SUBLANES)
                if coherent and chunk.rows > COHERENT_MIN_ROWS:
                    subl = SUBLANES_COHERENT
                return ptv.trace_nearest_packet8(
                    chunk.bvh8, chunk.tris_packed, o, d, t_min, chunk_tmax,
                    cull_backface=cull_backface, packet_sublanes=subl,
                    shade_rows=chunk.shade_packed, shade_mode=mode,
                    shared_origin=shared_origin,
                    alpha_mask=tables.alpha_masked,
                    fine_mask_rows=chunk.fine_mask_rows)
            return traverse.trace_nearest(
                chunk.bvh, _chunk_slice(tri_pos, chunk),
                _chunk_slice(tri_double_sided, chunk), o, d, t_min,
                chunk_tmax, cull_backface=cull_backface,
                tri_alpha_mask=chunk.tri_mask)

        if multi:
            n = o.shape[0]
            template = {"t": jnp.full((n,), -1.0, jnp.float32),
                        "tri": jnp.full((n,), -1, jnp.int32),
                        "u": jnp.zeros((n,), jnp.float32),
                        "v": jnp.zeros((n,), jnp.float32),
                        "hit": jnp.zeros((n,), bool)}
            if mode:
                template["n"] = jnp.zeros((n, 3), jnp.float32)
                template["mat"] = jnp.zeros((n,), jnp.int32)
            if mode == 2:
                template["tan"] = jnp.zeros((n, 3), jnp.float32)
                template["uv"] = jnp.zeros((n, 2), jnp.float32)
                template["uvd"] = jnp.zeros((n,), jnp.float32)
            rec = _skippable(run, any_possible, template)
        else:
            rec = run()
        rec = dict(rec)
        rec["tri"] = jnp.where(rec["hit"], rec["tri"] + chunk.row_offset,
                               -1)
        if best is None:
            best = rec
        else:
            better = rec["hit"] & (~best["hit"] | (rec["t"] < best["t"]))
            best = {k: jnp.where(
                better if best[k].ndim == 1 else better[:, None],
                rec[k], best[k]) for k in best}
        # Shrink the interval: later chunks only need closer hits.
        tmax = jnp.where(best["hit"], best["t"], tmax)
    return best


def trace_any(tables, tri_pos, tri_double_sided, o, d,
              t_min, t_max, coherent: bool = False):
    from steeljax.accel.instances import (InstancedTables,
                                          trace_nearest_instanced)
    if isinstance(tables, InstancedTables):
        return trace_nearest_instanced(tables, o, d, t_min, t_max,
                                       cull_backface=False,
                                       any_hit=True)["hit"]
    if tables.treelets is not None:
        from steeljax.accel.treelets import trace_treelets
        return trace_treelets(tables.treelets, o, d, t_min, t_max,
                              cull_backface=False, any_hit=True)["hit"]
    occluded = None
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o.shape[:1])
    multi = len(tables.chunks) > 1
    for chunk in tables.chunks:
        if multi:
            # Already-occluded rays need no further chunks either.
            live_tmax = jnp.where(occluded, RAY_DEAD_T, tmax) \
                if occluded is not None else tmax
            chunk_tmax, any_possible = _chunk_interval(chunk, o, d, tmin,
                                                       live_tmax)
        else:
            chunk_tmax = tmax

        def run(chunk=chunk, chunk_tmax=chunk_tmax):
            if tables.use_pallas:
                subl = (SUBLANES_BIG if chunk.rows > BIG_CHUNK_ROWS
                        else ptv.SUBLANES)
                if coherent and chunk.rows > COHERENT_MIN_ROWS:
                    subl = SUBLANES_COHERENT
                if chunk.anyhit_tris is not None:
                    # Dense ds-less 14-record rows: 14.3% fewer shadow
                    # leaf-row visits (the shadow analog of the
                    # reference's miss-test-only query).
                    return ptv.trace_anyhit_dense(
                        chunk.anyhit_bvh8, chunk.anyhit_tris, o, d,
                        t_min, chunk_tmax, packet_sublanes=subl)
                return ptv.trace_nearest_packet8(
                    chunk.bvh8, chunk.tris_packed, o, d, t_min, chunk_tmax,
                    cull_backface=False, any_hit=True,
                    packet_sublanes=subl,
                    alpha_mask=tables.alpha_masked,
                    fine_mask_rows=chunk.fine_mask_rows)["hit"]
            return traverse.trace_any(
                chunk.bvh, _chunk_slice(tri_pos, chunk),
                _chunk_slice(tri_double_sided, chunk), o, d, t_min,
                chunk_tmax, tri_alpha_mask=chunk.tri_mask)

        if multi:
            hit = _skippable(run, any_possible,
                             jnp.zeros((o.shape[0],), bool))
        else:
            hit = run()
        occluded = hit if occluded is None else (occluded | hit)
    return occluded
