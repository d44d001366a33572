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

BVH nodes (explicit format, steeljax.accel.bvh) and triangles live in VMEM
for the duration of the kernel.  This trades wasted lanes on incoherent
packets for perfectly dense VPU work, which is the right trade on this
hardware; ray reordering between bounces recovers coherence (SURVEY.md §7).

Memory layout: the triangle table is *flat-packed* into a (rows, 128) f32
array (TRI_PER_ROW=12 triangle records of TRI_STRIDE=10 floats per row,
8 pad lanes) so VMEM stores it densely — a (T, 10) array would pad every
row to 128 lanes (12.8x waste), and the previous 8 x 16 packing wasted 6
lanes per record (the chunk VMEM ceiling scales with this density: 42.7
vs 64 B/tri).  Leaf starts are TRI_PER_ROW-aligned (bvh._align_leaves),
so the kernel reads whole rows by dynamic sublane index and extracts
record fields at static lane offsets (Mosaic cannot index lanes
dynamically).  Nodes stay (N, 8) rows (few enough that lane padding is
cheap).

Triangle record (TRI_STRIDE f32): [v0.xyz, e1.xyz, e2.xyz, double_sided]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from steeljax.accel import alphamask
from steeljax.accel.bvh import BVH, TRI_PER_ROW, TRI_STRIDE

LANES = 128
# Fused-shading record layouts (pack_shade_records):
#   mode 1: SHADE1_STRIDE f32/record, TRI_PER_ROW records/row (same row
#           index as the triangle table);
#   mode 2: SHADE2_STRIDE f32/record, SHADE2_PER_ROW records/row — three
#           shade rows per triangle row (12 = 3 * 4).
SHADE1_STRIDE = 10
SHADE2_STRIDE = 26
SHADE2_PER_ROW = 4
SHADE2_ROWS_PER_TRI_ROW = TRI_PER_ROW // SHADE2_PER_ROW
# Default packet = 4096 rays: fewer scalar pops per ray.  Env override
# (STEELJAX_SUBLANES) is a measurement knob for re-sweeping packet shape
# when tree quality changes (VERDICT r4 #9); 32 is the tuned default.
import os as _os
SUBLANES = int(_os.environ.get("STEELJAX_SUBLANES", "32"))
# Dense any-hit record layout (pack_tris_dense): no ds/aux lane.
DENSE_PER_ROW = 14
DENSE_STRIDE = 9
BLOCK = LANES * SUBLANES  # rays per packet

# NOTE: Pallas interpret mode was evaluated for CPU CI coverage of these
# kernels and is not viable — the per-packet while_loop executes eagerly
# under the interpreter and a single 128-ray trace did not finish in 9
# minutes.  CI covers kernel *logic* via the shared encodings (bvh8
# collapse, leaf gating) and on-TPU parity renders instead.
_DET_EPS = 1e-12


def _pack_rows(records: np.ndarray, per_row: int) -> np.ndarray:
    """(T, S) -> (ceil(T/per_row), 128) rows: record j of a row occupies
    lanes [S*j, S*j + S); lanes past per_row*S are zero padding."""
    records = np.asarray(records, np.float32)
    t, stride = records.shape
    rows = -(-max(t, 1) // per_row)
    padded = np.zeros((rows * per_row, stride), np.float32)
    padded[:t] = records
    out = np.zeros((rows, LANES), np.float32)
    out[:, :per_row * stride] = padded.reshape(rows, per_row * stride)
    return out


def pack_tris(tri_pos: np.ndarray, tri_double_sided: np.ndarray,
              tri_alpha_mask: np.ndarray | None = None) -> np.ndarray:
    """Flat-packed triangle table: TRI_PER_ROW records of TRI_STRIDE f32
    per 128-lane row (42.7 B/triangle of VMEM).

    Without masks, lane 9 of a record is the double-sided flag as a plain
    0/1 float.  With `tri_alpha_mask` ((T,) uint32, accel.alphamask) the
    lane becomes the AUX encoding `ds | mask << 1` stored as an exact
    integer-valued float (<= 2^22), and the kernel must be built with
    alpha_mask=True to decode it — the in-kernel analog of the reference's
    any-hit alpha rejection (AnyHit.rahit:25-52)."""
    tri_pos = np.asarray(tri_pos, np.float32)
    t = tri_pos.shape[0]
    packed = np.zeros((t, TRI_STRIDE), np.float32)
    packed[:, 0:3] = tri_pos[:, 0]
    packed[:, 3:6] = tri_pos[:, 1] - tri_pos[:, 0]
    packed[:, 6:9] = tri_pos[:, 2] - tri_pos[:, 0]
    ds = np.asarray(tri_double_sided).astype(np.uint32)
    if tri_alpha_mask is None:
        packed[:, 9] = ds.astype(np.float32)
    else:
        aux = ds | (np.asarray(tri_alpha_mask, np.uint32) << 1)
        packed[:, 9] = aux.astype(np.float32)  # exact: < 2^22
    return _pack_rows(packed, TRI_PER_ROW)


def pack_tris_dense(tri_pos: np.ndarray) -> np.ndarray:
    """Dense ANY-HIT triangle table: DENSE_PER_ROW records of
    DENSE_STRIDE f32 per 128-lane row (36.6 B/triangle, 126/128 lanes).

    Occlusion queries run with cull_backface=False and no alpha masks,
    so the record needs neither the ds/aux lane nor shading attributes:
    [v0.xyz, e1.xyz, e2.xyz] — 14 records/row instead of 12, cutting
    shadow-ray leaf-row visits 14.3% at zero decode cost (the EXACT
    alternative to a quantized 16-record row, which would pay bf16
    decode on the VPU and crack shared edges).  Requires its own leaf
    alignment (bvh._align_leaves align=DENSE_PER_ROW) and supernode rows
    (dispatch builds both)."""
    tri_pos = np.asarray(tri_pos, np.float32)
    t = tri_pos.shape[0]
    packed = np.zeros((t, DENSE_STRIDE), np.float32)
    packed[:, 0:3] = tri_pos[:, 0]
    packed[:, 3:6] = tri_pos[:, 1] - tri_pos[:, 0]
    packed[:, 6:9] = tri_pos[:, 2] - tri_pos[:, 0]
    return _pack_rows(packed, DENSE_PER_ROW)


def pack_fine_mask_rows(fine_masks: np.ndarray) -> np.ndarray:
    """(T, FINE_STRIDE) int32 two-plane fine masks (accel.alphamask) ->
    (ceil(T/TRI_PER_ROW), 128) int32 rows parallel to pack_tris: record j
    of a row occupies lanes [FINE_STRIDE*j, FINE_STRIDE*j + FINE_STRIDE).
    Pad records get PASS = 0 (their MT test can never hit anyway)."""
    m = np.asarray(fine_masks, np.int32)
    t, stride = m.shape
    rows = -(-max(t, 1) // TRI_PER_ROW)
    padded = np.zeros((rows * TRI_PER_ROW, stride), np.int32)
    padded[:t] = m
    out = np.zeros((rows, LANES), np.int32)
    out[:, :TRI_PER_ROW * stride] = padded.reshape(
        rows, TRI_PER_ROW * stride)
    return out


def pack_shade_records(tri_nrm, tri_tan, tri_uv, tri_mat,
                       textured: bool, tri_uvd=None) -> np.ndarray:
    """Per-triangle shading records for the FUSED trace+shade kernel.

    A TPU XLA gather costs ~12 ns per *index* regardless of row width
    (measured on-chip), so the post-trace `tri_shade[tri]` row gather was
    ~2x the whole traversal kernel per bounce.  Instead the kernel
    interpolates vertex attributes per candidate hit and keeps the winner
    via selects — cost independent of scene size, no gather at all.

    Layouts (rows of 128 f32):
      untextured (SHADE1_STRIDE f32/record, TRI_PER_ROW per row, same row
      index as tris_packed):
        [n0.xyz, n1.xyz, n2.xyz, mat]
      textured (SHADE2_STRIDE f32/record, SHADE2_PER_ROW per row => 3
      shade rows per tris row):
        [... as above ..., t0.xyz, t1.xyz, t2.xyz,
         uv0.xy, uv1.xy, uv2.xy, uv_density]
    """
    nrm = np.asarray(tri_nrm, np.float32)
    t = nrm.shape[0]
    size = SHADE2_STRIDE if textured else SHADE1_STRIDE
    # Pad the record count to a multiple of TRI_PER_ROW so the shade table
    # spans a whole number of rows per tris_packed row — the kernel
    # indexes shade rows as multiples of the tris row index.
    t_pad = -(-max(t, 1) // TRI_PER_ROW) * TRI_PER_ROW
    packed = np.zeros((t_pad, size), np.float32)
    if t:
        packed[:t, 0:9] = nrm.reshape(t, 9)
        packed[:t, 9] = np.asarray(tri_mat, np.float32)
        if textured:
            packed[:t, 10:19] = np.asarray(
                tri_tan, np.float32).reshape(t, 9)
            uv = np.asarray(tri_uv, np.float32)
            packed[:t, 19:25] = uv.reshape(t, 6)
            if tri_uvd is not None:
                packed[:t, 25] = np.asarray(tri_uvd, np.float32)
    return _pack_rows(packed,
                      SHADE2_PER_ROW if textured else TRI_PER_ROW)


# ---------------------------------------------------------------------------
# Wide-BVH kernel: `width` children per scalar pop, encoded leaf entries
# ---------------------------------------------------------------------------

_LEAF_BITS = 21  # tri_row index bits (supports 2^21 * 12 = 25M triangles)


@functools.lru_cache(maxsize=None)
def batcher_network(n: int) -> tuple[tuple[int, int], ...]:
    """Batcher odd-even mergesort comparator network for n a power of two
    (19 CEs at n=8, 63 at n=16).  Each (i, j) with i < j is a compare-
    exchange; the kernel applies them descending so the nearest child is
    pushed LAST (LIFO pops it first — ordered descent)."""
    assert n & (n - 1) == 0 and n > 1, n
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)

# NOTE (measured, round 2): replacing the 8 per-child packet-min reduces
# + Batcher sort with 4 packed-bitfield any-hit reduces and a static push
# order made the Cornell frame 25% SLOWER (69.8 -> 86.7 ms) — near-first
# ordered descent prunes far more than its reduce/sort machinery costs.
# Don't revisit cheap/approximate child ordering.


def _fine_test(mrow, j: int, u, v, want_opaque: bool):
    """Two-plane fine mask test for record j of an int32 mask row
    (pack_fine_mask_rows): (keep, opaque-or-None).  Word selection is a
    static-offset select chain (Mosaic cannot index lanes dynamically);
    the bit shift is a plain dynamic vector shift."""
    moff = alphamask.FINE_STRIDE * j
    cell, in_dom = alphamask.fine_cell(u, v)
    word = cell >> 5
    bit = cell & 31
    pw = jnp.zeros_like(cell)
    for wd in range(alphamask.FINE_WORDS):
        pw = jnp.where(word == wd, mrow[moff + wd], pw)
    keep = (((pw >> bit) & 1) == 1) | ~in_dom
    if not want_opaque:
        return keep, None
    ow = jnp.zeros_like(cell)
    for wd in range(alphamask.FINE_WORDS):
        ow = jnp.where(word == wd, mrow[moff + alphamask.FINE_WORDS + wd],
                       ow)
    return keep, (((ow >> bit) & 1) == 1) & in_dom


def _traverse_kernel8(*refs, max_leaf: int,
                      cull_backface: bool, any_hit: bool = False,
                      shade_mode: int = 0, shared_origin: bool = False,
                      alpha_mask: bool = False, width: int = 8,
                      fine: bool = False, counters: bool = False,
                      dense: bool = False):
    """Packet traversal over wide supernode rows (steeljax.accel.bvh.BVH8).

    Stack entries encode both node kinds: >= 0 is a supernode id; < 0 is a
    leaf range enc = -(row | count << 21) - 1 with row = start //
    TRI_PER_ROW.
    One pop either slab-tests 8 children from one dense row (static lane
    extracts) or intersects one leaf's triangle rows.

    shade_mode > 0 FUSES shading-attribute extraction into the leaf loop
    (pack_shade_records layouts): vertex attributes are interpolated per
    candidate hit from scalar record reads and the winner is kept by
    select — replacing the post-trace `tri_shade[tri]` row gather, which
    costs ~12 ns/index on TPU (more than the whole traversal per bounce).
    Mode 1 emits (normal, material id); mode 2 adds (tangent, uv).

    dense=True reads the 14-record ds-less layout (pack_tris_dense) —
    any-hit occlusion only (no culling, no masks, no shading).
    """
    if dense:
        assert any_hit and not cull_backface and not shade_mode \
            and not alpha_mask and not fine, "dense rows are any-hit-only"
    per_row = DENSE_PER_ROW if dense else TRI_PER_ROW
    rec_stride = DENSE_STRIDE if dense else TRI_STRIDE
    f32 = jnp.float32
    it = iter(refs)
    snodes_ref = next(it)
    tris_ref = next(it)
    shade_ref = next(it) if shade_mode else None
    masks_ref = next(it) if fine else None
    ox, oy, oz, dx, dy, dz, tmn, tmx = (next(it) for _ in range(8))
    out_t, out_u, out_v, out_i = (next(it) for _ in range(4))
    if shade_mode:
        out_nx, out_ny, out_nz, out_mat = (next(it) for _ in range(4))
    if shade_mode == 2:
        out_tx, out_ty, out_tz, out_ux, out_uy, out_uvd = (
            next(it) for _ in range(6))
    out_cnt = next(it) if counters else None
    stack_ref = next(it)
    sp_ref = next(it)
    bt_ref, bu_ref, bv_ref, bi_ref = (next(it) for _ in range(4))
    if shade_mode:
        bnx_ref, bny_ref, bnz_ref, bmat_ref, bdet_ref = (
            next(it) for _ in range(5))
    if shade_mode == 2:
        btx_ref, bty_ref, btz_ref, bux_ref, buy_ref, buvd_ref = (
            next(it) for _ in range(6))
    cnt_ref = next(it) if counters else None

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d < 0, -1e-12, 1e-12), d)

    # NOTE: a shared-direction specialization (directional-light shadow
    # batches -> scalar reciprocals + scalar Moller-Trumbore p/det) was
    # tried and MEASURED SLOWER (hybrid 147 -> 157 ms): this loop is
    # scalar-issue-bound, so moving vector math onto the scalar unit
    # backfires.  Keep everything vectorized.
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    inv_dx = safe_inv(d_x)
    inv_dy = safe_inv(d_y)
    inv_dz = safe_inv(d_z)
    if shared_origin:
        # Pinhole primaries: every lane shares one origin, so the per-
        # child slab offsets and most of Moller-Trumbore's t/q terms
        # collapse to scalar-unit work (padding lanes inherit the real
        # origin; their outputs are sliced off).
        o_x, o_y, o_z = ox[0, 0], oy[0, 0], oz[0, 0]
    else:
        o_x, o_y, o_z = ox[:], oy[:], oz[:]

    bt_ref[:] = tmx[:]
    bu_ref[:] = jnp.zeros_like(tmx[:])
    bv_ref[:] = jnp.zeros_like(tmx[:])
    bi_ref[:] = jnp.full(tmx.shape, -1, jnp.int32)
    if shade_mode:
        bnx_ref[:] = jnp.zeros_like(tmx[:])
        bny_ref[:] = jnp.zeros_like(tmx[:])
        bnz_ref[:] = jnp.ones_like(tmx[:])
        bmat_ref[:] = jnp.zeros_like(tmx[:])
        bdet_ref[:] = jnp.ones_like(tmx[:])
    if shade_mode == 2:
        btx_ref[:] = jnp.ones_like(tmx[:])
        bty_ref[:] = jnp.zeros_like(tmx[:])
        btz_ref[:] = jnp.zeros_like(tmx[:])
        bux_ref[:] = jnp.zeros_like(tmx[:])
        buy_ref[:] = jnp.zeros_like(tmx[:])
        buvd_ref[:] = jnp.zeros_like(tmx[:])

    stack_ref[0] = 0
    sp_ref[0] = 1
    if counters:
        cnt_ref[0] = 0
        cnt_ref[1] = 0
        cnt_ref[2] = 0

    def cond(_):
        return sp_ref[0] > 0

    def body(_):
        sp = sp_ref[0]
        entry = stack_ref[sp - 1]
        sp_ref[0] = sp - 1

        @pl.when(entry >= 0)
        def _supernode():
            if counters:
                cnt_ref[0] = cnt_ref[0] + 1
            row = snodes_ref[entry]  # (128,)
            big = jnp.float32(3.0e38)
            stride = LANES // width
            keys = []
            vals = []
            for c in range(width):
                off = stride * c
                t0x = (row[off + 0] - o_x) * inv_dx
                t1x = (row[off + 3] - o_x) * inv_dx
                t0y = (row[off + 1] - o_y) * inv_dy
                t1y = (row[off + 4] - o_y) * inv_dy
                t0z = (row[off + 2] - o_z) * inv_dz
                t1z = (row[off + 5] - o_z) * inv_dz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z))
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                hit = (near <= far) & (far >= tmn[:]) & (near <= bt_ref[:])
                meta0 = row[off + 6].astype(jnp.int32)
                meta1 = row[off + 7].astype(jnp.int32)
                # Packet-min entry distance doubles as the hit predicate
                # (< big) and the ordering key for near-first descent.
                near_min = jnp.min(jnp.where(hit, near, big))
                is_leaf_child = meta1 > 0
                enc = (meta0 // per_row) | (meta1 << _LEAF_BITS)
                entry_val = jnp.where(is_leaf_child, -(enc + 1), meta0)
                keys.append(jnp.where(meta0 >= 0, near_min, big))
                vals.append(entry_val)

            # Descending-key sorting network (Batcher, 19 CEs at width 8,
            # 63 at 16): nearest child is pushed LAST, so LIFO pops it
            # first — ordered traversal tightens best_t early and prunes
            # the rest.
            for i, j in batcher_network(width):
                swap = keys[i] < keys[j]
                ki = jnp.where(swap, keys[j], keys[i])
                kj = jnp.where(swap, keys[i], keys[j])
                vi = jnp.where(swap, vals[j], vals[i])
                vj = jnp.where(swap, vals[i], vals[j])
                keys[i], keys[j] = ki, kj
                vals[i], vals[j] = vi, vj

            for c in range(width):
                do_push = keys[c] < big
                s = sp_ref[0]
                stack_ref[s] = vals[c]
                sp_ref[0] = s + do_push.astype(jnp.int32)

        @pl.when(entry < 0)
        def _leaf():
            enc = -entry - 1
            row_base = enc & ((1 << _LEAF_BITS) - 1)
            cnt = enc >> _LEAF_BITS
            if counters:
                cnt_ref[2] = cnt_ref[2] + 1

            # NOTE (round 4, measured): a pop-time row-AABB re-test
            # against the CURRENT best-t (row boxes in the 8 pad lanes)
            # skipped 12-29% of row bodies on every workload and was
            # SLOWER on all of them (stress diffuse 818 -> 892 ms at
            # 29.4% skipped; hybrid primary 61.9 -> 65.6 at 17.2%): the
            # per-row @pl.when serializes the row loop and defeats
            # Mosaic's pipelining of consecutive row reads, the same
            # failure mode as the round-2b interleaved sub-packets.
            # Don't re-try conditional row skipping.
            def intersect_row(r):
                if counters:
                    cnt_ref[1] = cnt_ref[1] + 1
                trow = tris_ref[row_base + r]  # (128,) = TRI_PER_ROW recs
                mrow = masks_ref[row_base + r] if fine else None
                if shade_mode == 1:
                    srow0 = shade_ref[row_base + r]
                elif shade_mode == 2:
                    srows = [
                        shade_ref[(row_base + r) * SHADE2_ROWS_PER_TRI_ROW
                                  + k]
                        for k in range(SHADE2_ROWS_PER_TRI_ROW)]
                for j in range(per_row):
                    l = r * per_row + j
                    off = rec_stride * j
                    v0x = trow[off + 0]
                    v0y = trow[off + 1]
                    v0z = trow[off + 2]
                    e1x = trow[off + 3]
                    e1y = trow[off + 4]
                    e1z = trow[off + 5]
                    e2x = trow[off + 6]
                    e2y = trow[off + 7]
                    e2z = trow[off + 8]
                    if dense:
                        ds_flag = None  # no culling in dense any-hit rows
                    elif alpha_mask:
                        # AUX lane (pack_tris with masks): bit 0 = double-
                        # sided, bits [1, 22) = the conservative alpha-
                        # coverage mask (accel.alphamask).  Exact integer-
                        # valued float, so the scalar cast is lossless.
                        aux = trow[off + 9].astype(jnp.int32)
                        ds_flag = (aux & 1) == 1
                        amask = aux >> 1
                    else:
                        ds_flag = trow[off + 9] > 0.5

                    px = d_y * e2z - d_z * e2y
                    py = d_z * e2x - d_x * e2z
                    pz = d_x * e2y - d_y * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    if cull_backface:
                        facing = (det > _DET_EPS) | (
                            ds_flag & (jnp.abs(det) > _DET_EPS))
                    else:
                        facing = jnp.abs(det) > _DET_EPS
                    inv_det = 1.0 / jnp.where(
                        jnp.abs(det) > _DET_EPS, det, 1.0)
                    tx = o_x - v0x
                    ty = o_y - v0y
                    tz = o_z - v0z
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    v = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    hit = (facing & (u >= 0.0) & (v >= 0.0)
                           & (u + v <= 1.0) & (t >= tmn[:])
                           & (t <= bt_ref[:]) & (l < cnt))
                    if alpha_mask:
                        # In-kernel any-hit alpha rejection (AnyHit.rahit:
                        # 25-52): drop candidates whose barycentric cell
                        # is provably below the cutoff, so transparent
                        # texels never win the nearest-hit select and the
                        # integrator re-trace runs only for boundary
                        # cells.  ~12 extra VPU ops; the mask shift rides
                        # the scalar broadcast of aux.
                        hit = hit & alphamask.mask_test(amask, u, v)
                    if fine:
                        # Fine PASS plane (7.3x the aux cells): cuts the
                        # false-nearest-winner rate, so the integrator's
                        # bounded re-trace fires on far fewer rays.
                        keep, _ = _fine_test(mrow, j, u, v, False)
                        hit = hit & keep
                    if any_hit:
                        # Occlusion query: ANY hit finishes the lane, so
                        # sink its best-t to -inf — the lane then fails
                        # every later node/leaf interval test and stops
                        # inflating the packet's traversal union.  The
                        # sunk t doubles as the hit flag, so the u/v/tri
                        # winner selects below are skipped entirely —
                        # the any-hit row body is intersection-only, the
                        # shadow-ray analog of the reference's
                        # miss-test-only query (Lighting.glsl:229-234).
                        bt_ref[:] = jnp.where(hit, jnp.float32(-3e38),
                                              bt_ref[:])
                    else:
                        bt_ref[:] = jnp.where(hit, t, bt_ref[:])
                        bu_ref[:] = jnp.where(hit, u, bu_ref[:])
                        bv_ref[:] = jnp.where(hit, v, bv_ref[:])
                        bi_ref[:] = jnp.where(
                            hit, row_base * TRI_PER_ROW + jnp.int32(l),
                            bi_ref[:])
                    if shade_mode:
                        if shade_mode == 1:
                            srow, soff = srow0, off
                        else:
                            srow = srows[j // SHADE2_PER_ROW]
                            soff = SHADE2_STRIDE * (j % SHADE2_PER_ROW)
                        # Candidate-hit attribute interpolation: the
                        # barycentrics are live vectors, the record fields
                        # are scalars, so interp is 3 FMAs/component and
                        # the winner costs one select/component.
                        wb = 1.0 - u - v
                        bnx_ref[:] = jnp.where(
                            hit, srow[soff + 0] * wb + srow[soff + 3] * u
                            + srow[soff + 6] * v, bnx_ref[:])
                        bny_ref[:] = jnp.where(
                            hit, srow[soff + 1] * wb + srow[soff + 4] * u
                            + srow[soff + 7] * v, bny_ref[:])
                        bnz_ref[:] = jnp.where(
                            hit, srow[soff + 2] * wb + srow[soff + 5] * u
                            + srow[soff + 8] * v, bnz_ref[:])
                        bmat_ref[:] = jnp.where(
                            hit, srow[soff + 9], bmat_ref[:])
                        bdet_ref[:] = jnp.where(hit, det, bdet_ref[:])
                    if shade_mode == 2:
                        btx_ref[:] = jnp.where(
                            hit, srow[soff + 10] * wb + srow[soff + 13] * u
                            + srow[soff + 16] * v, btx_ref[:])
                        bty_ref[:] = jnp.where(
                            hit, srow[soff + 11] * wb + srow[soff + 14] * u
                            + srow[soff + 17] * v, bty_ref[:])
                        btz_ref[:] = jnp.where(
                            hit, srow[soff + 12] * wb + srow[soff + 15] * u
                            + srow[soff + 18] * v, btz_ref[:])
                        bux_ref[:] = jnp.where(
                            hit, srow[soff + 19] * wb + srow[soff + 21] * u
                            + srow[soff + 23] * v, bux_ref[:])
                        buy_ref[:] = jnp.where(
                            hit, srow[soff + 20] * wb + srow[soff + 22] * u
                            + srow[soff + 24] * v, buy_ref[:])
                        buvd_ref[:] = jnp.where(
                            hit, srow[soff + 25], buvd_ref[:])

            # SAH leaves usually hold far fewer than max_leaf triangles;
            # gate each row on the actual count so a small leaf skips
            # whole rows (row 0 always runs: cnt >= 1).
            intersect_row(0)
            for r in range(1, -(-max_leaf // per_row)):
                pl.when(cnt > r * per_row)(
                    functools.partial(intersect_row, r))
            if any_hit:
                # Dead (inverted-interval) lanes count as blocked — see
                # the binary kernel's occlusion-query note.  The sunk
                # best-t IS the hit flag (no bi bookkeeping in any-hit).
                @pl.when(jnp.all((bt_ref[:] < jnp.float32(-2.9e38))
                                 | (tmx[:] < tmn[:])))
                def _done():
                    sp_ref[0] = 0
        return 0

    jax.lax.while_loop(cond, body, 0)

    if any_hit:
        # Hit flag = sunk best-t, excluding dead lanes (whose inverted
        # interval parks tmx at RAY_DEAD_T = -3e38 = the sink value).
        found = (bt_ref[:] < f32(-2.9e38)) & (tmx[:] >= tmn[:])
        out_i[:] = jnp.where(found, 0, -1)
    else:
        found = bi_ref[:] >= 0
        out_i[:] = bi_ref[:]
    out_t[:] = jnp.where(found, bt_ref[:], f32(-1.0))
    out_u[:] = bu_ref[:]
    out_v[:] = bv_ref[:]
    if shade_mode:
        # Normalize + backface flip (ClosestHit.rchit:67-70): det < 0 is
        # the winding-based hit-kind (det = -d . geometric_normal).
        n2 = (bnx_ref[:] * bnx_ref[:] + bny_ref[:] * bny_ref[:]
              + bnz_ref[:] * bnz_ref[:])
        sgn = jnp.where(bdet_ref[:] < 0.0, f32(-1.0), f32(1.0))
        inv_n = sgn * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))
        out_nx[:] = bnx_ref[:] * inv_n
        out_ny[:] = bny_ref[:] * inv_n
        out_nz[:] = bnz_ref[:] * inv_n
        out_mat[:] = bmat_ref[:].astype(jnp.int32)
    if shade_mode == 2:
        t2 = (btx_ref[:] * btx_ref[:] + bty_ref[:] * bty_ref[:]
              + btz_ref[:] * btz_ref[:])
        inv_t = jax.lax.rsqrt(jnp.maximum(t2, 1e-20))
        out_tx[:] = btx_ref[:] * inv_t
        out_ty[:] = bty_ref[:] * inv_t
        out_tz[:] = btz_ref[:] * inv_t
        out_ux[:] = bux_ref[:]
        out_uy[:] = buy_ref[:]
        out_uvd[:] = buvd_ref[:]
    if counters:
        # Per-packet traversal-work telemetry (probe-only): lane 0 =
        # supernode pops, lane 1 = triangle-row bodies executed, lane 2 =
        # leaf entries popped.  Full-array output spec (a (1, 128) block
        # does not lower); each grid step writes its own row.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        vals = jnp.where(
            lane == 0, cnt_ref[0],
            jnp.where(lane == 1, cnt_ref[1],
                      jnp.where(lane == 2, cnt_ref[2], 0)))
        out_cnt[pl.ds(pl.program_id(0), 1)] = vals


@functools.partial(
    jax.jit,
    static_argnames=("max_leaf", "depth", "cull_backface", "any_hit",
                     "packet_sublanes", "shade_mode", "shared_origin",
                     "alpha_mask", "width", "counters", "dense"))
def _trace_packed8(snode_rows, tris_packed, o, d, t_min, t_max,
                   max_leaf: int, depth: int,
                   cull_backface: bool, any_hit: bool = False,
                   packet_sublanes: int = SUBLANES,
                   shade_rows: jnp.ndarray | None = None,
                   shade_mode: int = 0, shared_origin: bool = False,
                   alpha_mask: bool = False, width: int = 8,
                   fine_mask_rows=None, counters: bool = False,
                   dense: bool = False):
    fine = fine_mask_rows is not None
    count = o.shape[0]
    block = LANES * packet_sublanes
    padded = -(-count // block) * block
    pad = padded - count

    def prep(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o = prep(o)
    d = prep(d, 1.0)
    tmn = prep(jnp.broadcast_to(t_min, (count,)))
    # Pad lanes must trace nothing: -3e38 guarantees root rejection
    # (-1.0 still descends nodes spanning >1 unit behind the origin).
    tmx = prep(jnp.broadcast_to(t_max, (count,)), -3.0e38)

    rows = padded // LANES
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmn, tmx]
    comps = [c.reshape(rows, LANES) for c in comps]

    grid = (rows // packet_sublanes,)
    ray_spec = pl.BlockSpec((packet_sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _traverse_kernel8, max_leaf=max_leaf,
        cull_backface=cull_backface, any_hit=any_hit,
        shade_mode=shade_mode, shared_origin=shared_origin,
        alpha_mask=alpha_mask, width=width, fine=fine,
        counters=counters, dense=dense)

    f32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    out_shape = [f32tile, f32tile, f32tile, i32tile]
    out_specs = [ray_spec] * 4
    n_shade_out = 0
    if shade_mode:
        out_shape += [f32tile, f32tile, f32tile, i32tile]
        out_specs += [ray_spec] * 4
        n_shade_out += 4
    if shade_mode == 2:
        out_shape += [f32tile] * 6
        out_specs += [ray_spec] * 6
        n_shade_out += 6
    if counters:
        out_shape.append(
            jax.ShapeDtypeStruct((grid[0], LANES), jnp.int32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    vmem = lambda dt: pltpu.VMEM((packet_sublanes, LANES), dt)
    scratch = [
        pltpu.SMEM((width * depth + 16,), jnp.int32),  # encoded stack
        pltpu.SMEM((1,), jnp.int32),
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),
        vmem(jnp.int32),
    ]
    if shade_mode:
        scratch += [vmem(jnp.float32)] * 5     # bn xyz, bmat, bdet
    if shade_mode == 2:
        scratch += [vmem(jnp.float32)] * 6     # bt xyz, buv xy, buvd
    if counters:
        scratch.append(pltpu.SMEM((4,), jnp.int32))

    inputs = [snode_rows, tris_packed]
    in_specs = [full, full]
    if shade_mode:
        inputs.append(shade_rows)
        in_specs.append(full)
    if fine:
        inputs.append(fine_mask_rows)
        in_specs.append(full)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),

    )(*inputs, *comps)

    def unpad(x):
        return x.reshape(-1)[:count]

    t, u, v, idx = (unpad(x) for x in outs[:4])
    rec = {"t": t, "tri": idx, "u": u, "v": v, "hit": idx >= 0}
    if shade_mode:
        nx, ny, nz, mat = (unpad(x) for x in outs[4:8])
        rec["n"] = jnp.stack([nx, ny, nz], axis=-1)
        rec["mat"] = mat
    if shade_mode == 2:
        tx, ty, tz, ux, uy, uvd = (unpad(x) for x in outs[8:14])
        rec["tan"] = jnp.stack([tx, ty, tz], axis=-1)
        rec["uv"] = jnp.stack([ux, uy], axis=-1)
        rec["uvd"] = uvd
    if counters:
        # (n_packets, 3): per-packet [supernode pops, tri-row bodies,
        # leaf pops].
        rec["counters"] = outs[-1][:, :3]
    return rec


def trace_nearest_packet8(bvh8, tris_packed, o, d, t_min, t_max,
                          cull_backface: bool = True,
                          any_hit: bool = False,
                          packet_sublanes: int = SUBLANES,
                          shade_rows=None, shade_mode: int = 0,
                          shared_origin: bool = False,
                          alpha_mask: bool = False,
                          fine_mask_rows=None, counters: bool = False):
    """BVH8 packet traversal; same contract as traverse.trace_nearest.
    With shade_mode > 0 (and shade_rows from pack_shade_records) the
    record also carries fused shading attributes: "n" + "mat" (mode 1),
    plus "tan" + "uv" (mode 2).  alpha_mask=True decodes the AUX lane's
    conservative coverage mask (tris_packed must have been packed with
    tri_alpha_mask) and rejects sub-cutoff candidates in-kernel;
    `fine_mask_rows` (pack_fine_mask_rows) additionally rejects on the
    7.3x-resolution fine PASS plane."""
    return _trace_packed8(bvh8.rows, tris_packed, o, d,
                          jnp.asarray(t_min, jnp.float32),
                          jnp.asarray(t_max, jnp.float32),
                          bvh8.max_leaf, bvh8.depth, cull_backface, any_hit,
                          packet_sublanes=packet_sublanes,
                          shade_rows=shade_rows, shade_mode=shade_mode,
                          shared_origin=shared_origin,
                          alpha_mask=alpha_mask,
                          width=getattr(bvh8, "width", 8),
                          fine_mask_rows=fine_mask_rows,
                          counters=counters)


def trace_anyhit_dense(bvh8_dense, tris_dense, o, d, t_min, t_max,
                       packet_sublanes: int = SUBLANES):
    """Occlusion query over the dense 14-record table (pack_tris_dense).
    bvh8_dense must be the re-aligned collapse (leaf starts at multiples
    of DENSE_PER_ROW — dispatch builds it next to the nearest tables).
    Returns the occlusion mask (N,) bool; no culling, no masks."""
    return _trace_packed8(bvh8_dense.rows, tris_dense, o, d,
                          jnp.asarray(t_min, jnp.float32),
                          jnp.asarray(t_max, jnp.float32),
                          bvh8_dense.max_leaf, bvh8_dense.depth,
                          cull_backface=False, any_hit=True,
                          packet_sublanes=packet_sublanes,
                          width=getattr(bvh8_dense, "width", 8),
                          dense=True)["hit"]


# ---------------------------------------------------------------------------
# Multi-hit (K-nearest) kernel: the TPU-native any-hit alpha loop
# ---------------------------------------------------------------------------
# The reference's any-hit shader continues traversal past alpha-rejected
# texels (AnyHit.rahit:25-52) at zero restart cost.  The packet kernel
# cannot sample textures per candidate, so restart schemes paid a FULL
# traversal per rejected layer (measured 4.8 s/pass at 0.9M rays on the
# foliage bench, frame time linear in max_alpha_retrace).  This kernel
# instead returns the K NEAREST candidate hits (post-coverage-mask) in
# ONE traversal: the integrator exact-tests the K candidates per ray and
# re-traces only rays whose K candidates ALL reject — the in-traversal
# continuation the reference gets from hardware, re-expressed as a
# per-lane insertion-sorted K-slot select chain.


def _multihit_kernel(*refs, max_leaf: int, k_hits: int,
                     cull_backface: bool, alpha_mask: bool, width: int,
                     fine: bool = False):
    """Packet traversal collecting the K nearest surviving hits per lane.

    Slot state: K (t, u, v, tri) quadruples per lane, sorted ascending by
    t.  A candidate hit inserts by a shift/place select cascade (one
    element into a sorted list); the traversal prune bound is slot K-1's
    t — any useful hit must enter the list.  Opaque and alpha triangles
    share the list: the integrator's exact test never rejects opaque
    materials, so no per-record flag is needed.

    With fine=True a parallel int32 mask-row table (pack_fine_mask_rows)
    supplies two planes per record (accel.alphamask FINE_*): PASS bits
    reject provably-transparent candidates at 7.3x the aux lane's cell
    resolution, and OPAQUE bits (exact test provably keeps the hit) feed
    a per-ray opaque bound `ob` — traversal prunes against min(slot K-1,
    ob) and final slots are filtered to t <= ob, which is deterministic:
    the output equals the K nearest PASS-hits with t <= min over ALL
    opaque hits (the parity oracle recomputes exactly that).
    """
    f32 = jnp.float32
    it = iter(refs)
    snodes_ref = next(it)
    tris_ref = next(it)
    masks_ref = next(it) if fine else None
    ox, oy, oz, dx, dy, dz, tmn, tmx = (next(it) for _ in range(8))
    out_t = [next(it) for _ in range(k_hits)]
    out_u = [next(it) for _ in range(k_hits)]
    out_v = [next(it) for _ in range(k_hits)]
    out_i = [next(it) for _ in range(k_hits)]
    stack_ref = next(it)
    sp_ref = next(it)
    st = [next(it) for _ in range(k_hits)]
    su = [next(it) for _ in range(k_hits)]
    sv = [next(it) for _ in range(k_hits)]
    si = [next(it) for _ in range(k_hits)]
    ob_ref = next(it) if fine else None

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d < 0, -1e-12, 1e-12), d)

    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    inv_dx = safe_inv(d_x)
    inv_dy = safe_inv(d_y)
    inv_dz = safe_inv(d_z)
    o_x, o_y, o_z = ox[:], oy[:], oz[:]

    for k in range(k_hits):
        st[k][:] = tmx[:]
        su[k][:] = jnp.zeros_like(tmx[:])
        sv[k][:] = jnp.zeros_like(tmx[:])
        si[k][:] = jnp.full(tmx.shape, -1, jnp.int32)
    if fine:
        ob_ref[:] = tmx[:]

    stack_ref[0] = 0
    sp_ref[0] = 1

    def cond(_):
        return sp_ref[0] > 0

    def body(_):
        sp = sp_ref[0]
        entry = stack_ref[sp - 1]
        sp_ref[0] = sp - 1

        @pl.when(entry >= 0)
        def _supernode():
            row = snodes_ref[entry]  # (128,)
            big = jnp.float32(3.0e38)
            stride = LANES // width
            bound = st[k_hits - 1][:]
            if fine:
                bound = jnp.minimum(bound, ob_ref[:])
            keys = []
            vals = []
            for c in range(width):
                off = stride * c
                t0x = (row[off + 0] - o_x) * inv_dx
                t1x = (row[off + 3] - o_x) * inv_dx
                t0y = (row[off + 1] - o_y) * inv_dy
                t1y = (row[off + 4] - o_y) * inv_dy
                t0z = (row[off + 2] - o_z) * inv_dz
                t1z = (row[off + 5] - o_z) * inv_dz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x),
                                jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z))
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x),
                                jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z))
                hit = (near <= far) & (far >= tmn[:]) & (near <= bound)
                meta0 = row[off + 6].astype(jnp.int32)
                meta1 = row[off + 7].astype(jnp.int32)
                near_min = jnp.min(jnp.where(hit, near, big))
                is_leaf_child = meta1 > 0
                enc = (meta0 // TRI_PER_ROW) | (meta1 << _LEAF_BITS)
                entry_val = jnp.where(is_leaf_child, -(enc + 1), meta0)
                keys.append(jnp.where(meta0 >= 0, near_min, big))
                vals.append(entry_val)

            for i, j in batcher_network(width):
                swap = keys[i] < keys[j]
                ki = jnp.where(swap, keys[j], keys[i])
                kj = jnp.where(swap, keys[i], keys[j])
                vi = jnp.where(swap, vals[j], vals[i])
                vj = jnp.where(swap, vals[i], vals[j])
                keys[i], keys[j] = ki, kj
                vals[i], vals[j] = vi, vj

            for c in range(width):
                do_push = keys[c] < big
                s = sp_ref[0]
                stack_ref[s] = vals[c]
                sp_ref[0] = s + do_push.astype(jnp.int32)

        @pl.when(entry < 0)
        def _leaf():
            enc = -entry - 1
            row_base = enc & ((1 << _LEAF_BITS) - 1)
            cnt = enc >> _LEAF_BITS

            def intersect_row(r):
                trow = tris_ref[row_base + r]
                mrow = masks_ref[row_base + r] if fine else None
                for j in range(TRI_PER_ROW):
                    l = r * TRI_PER_ROW + j
                    off = TRI_STRIDE * j
                    v0x = trow[off + 0]
                    v0y = trow[off + 1]
                    v0z = trow[off + 2]
                    e1x = trow[off + 3]
                    e1y = trow[off + 4]
                    e1z = trow[off + 5]
                    e2x = trow[off + 6]
                    e2y = trow[off + 7]
                    e2z = trow[off + 8]
                    if alpha_mask:
                        aux = trow[off + 9].astype(jnp.int32)
                        ds_flag = (aux & 1) == 1
                        amask = aux >> 1
                    else:
                        ds_flag = trow[off + 9] > 0.5

                    px = d_y * e2z - d_z * e2y
                    py = d_z * e2x - d_x * e2z
                    pz = d_x * e2y - d_y * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    if cull_backface:
                        facing = (det > _DET_EPS) | (
                            ds_flag & (jnp.abs(det) > _DET_EPS))
                    else:
                        facing = jnp.abs(det) > _DET_EPS
                    inv_det = 1.0 / jnp.where(
                        jnp.abs(det) > _DET_EPS, det, 1.0)
                    tx = o_x - v0x
                    ty = o_y - v0y
                    tz = o_z - v0z
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    v = (d_x * qx + d_y * qy + d_z * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    old_t = [st[k][:] for k in range(k_hits)]
                    old_u = [su[k][:] for k in range(k_hits)]
                    old_v = [sv[k][:] for k in range(k_hits)]
                    old_i = [si[k][:] for k in range(k_hits)]
                    hit = (facing & (u >= 0.0) & (v >= 0.0)
                           & (u + v <= 1.0) & (t >= tmn[:])
                           & (l < cnt))
                    if alpha_mask:
                        # Provably-transparent candidates never enter the
                        # list (the integrator's exact test would have
                        # rejected them anyway — accel.alphamask).
                        hit = hit & alphamask.mask_test(amask, u, v)
                    if fine:
                        keep, opq = _fine_test(mrow, j, u, v, True)
                        hit = hit & keep
                        opq = hit & opq
                        # Every opaque-plane hit bounds traversal, slot
                        # member or not (it occludes everything behind).
                        ob_ref[:] = jnp.where(opq & (t < ob_ref[:]), t,
                                              ob_ref[:])
                    hit = hit & (t < old_t[k_hits - 1])
                    tri_id = row_base * TRI_PER_ROW + jnp.int32(l)
                    # Sorted insertion: shift slots >= insert index down
                    # one, then place.  Shift and place conditions are
                    # disjoint per slot (t < old_t[k-1] vs t >= old_t[k-1]).
                    for k in range(k_hits - 1, 0, -1):
                        sh = hit & (t < old_t[k - 1])
                        st[k][:] = jnp.where(sh, old_t[k - 1], old_t[k])
                        su[k][:] = jnp.where(sh, old_u[k - 1], old_u[k])
                        sv[k][:] = jnp.where(sh, old_v[k - 1], old_v[k])
                        si[k][:] = jnp.where(sh, old_i[k - 1], old_i[k])
                    for k in range(k_hits):
                        place = hit & (t < old_t[k])
                        if k:
                            place = place & (t >= old_t[k - 1])
                        st[k][:] = jnp.where(place, t, st[k][:])
                        su[k][:] = jnp.where(place, u, su[k][:])
                        sv[k][:] = jnp.where(place, v, sv[k][:])
                        si[k][:] = jnp.where(place, tri_id, si[k][:])

            intersect_row(0)
            for r in range(1, -(-max_leaf // TRI_PER_ROW)):
                pl.when(cnt > r * TRI_PER_ROW)(
                    functools.partial(intersect_row, r))
        return 0

    jax.lax.while_loop(cond, body, 0)

    for k in range(k_hits):
        found = si[k][:] >= 0
        if fine:
            # Slots behind the nearest opaque hit are occluded; dropping
            # them here makes the output order-independent (= the oracle's
            # K nearest PASS-hits with t <= min opaque t).
            found = found & (st[k][:] <= ob_ref[:])
        out_t[k][:] = jnp.where(found, st[k][:], f32(-1.0))
        out_u[k][:] = su[k][:]
        out_v[k][:] = sv[k][:]
        out_i[k][:] = jnp.where(found, si[k][:], -1)


@functools.partial(
    jax.jit,
    static_argnames=("max_leaf", "depth", "k_hits", "cull_backface",
                     "packet_sublanes", "alpha_mask", "width"))
def _trace_multihit(snode_rows, tris_packed, o, d, t_min, t_max,
                    max_leaf: int, depth: int, k_hits: int,
                    cull_backface: bool,
                    packet_sublanes: int = SUBLANES,
                    alpha_mask: bool = False, width: int = 8,
                    fine_mask_rows=None):
    fine = fine_mask_rows is not None
    count = o.shape[0]
    block = LANES * packet_sublanes
    padded = -(-count // block) * block
    pad = padded - count

    def prep(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o = prep(o)
    d = prep(d, 1.0)
    tmn = prep(jnp.broadcast_to(t_min, (count,)))
    tmx = prep(jnp.broadcast_to(t_max, (count,)), -3.0e38)

    rows = padded // LANES
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmn, tmx]
    comps = [c.reshape(rows, LANES) for c in comps]

    grid = (rows // packet_sublanes,)
    ray_spec = pl.BlockSpec((packet_sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _multihit_kernel, max_leaf=max_leaf, k_hits=k_hits,
        cull_backface=cull_backface, alpha_mask=alpha_mask, width=width,
        fine=fine)

    f32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    out_shape = ([f32tile] * (3 * k_hits)) + [i32tile] * k_hits

    vmem = lambda dt: pltpu.VMEM((packet_sublanes, LANES), dt)
    scratch = [
        pltpu.SMEM((width * depth + 16,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    scratch += [vmem(jnp.float32)] * (3 * k_hits)
    scratch += [vmem(jnp.int32)] * k_hits
    if fine:
        scratch.append(vmem(jnp.float32))  # opaque bound

    tables = [snode_rows, tris_packed]
    if fine:
        tables.append(fine_mask_rows)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full] * len(tables) + [ray_spec] * 8,
        out_specs=[ray_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(*tables, *comps)

    def unpad(x):
        return x.reshape(-1)[:count]

    t = jnp.stack([unpad(x) for x in outs[:k_hits]])
    u = jnp.stack([unpad(x) for x in outs[k_hits:2 * k_hits]])
    v = jnp.stack([unpad(x) for x in outs[2 * k_hits:3 * k_hits]])
    tri = jnp.stack([unpad(x) for x in outs[3 * k_hits:4 * k_hits]])
    return {"t": t, "u": u, "v": v, "tri": tri}


def trace_multihit_packet8(bvh8, tris_packed, o, d, t_min, t_max,
                           k_hits: int, cull_backface: bool = True,
                           packet_sublanes: int = SUBLANES,
                           alpha_mask: bool = False,
                           fine_mask_rows=None):
    """K-nearest packet traversal: returns {"t", "u", "v", "tri"} stacked
    (k_hits, N) arrays sorted ascending by t per ray; slot k's tri is -1
    (t -1.0) when the ray has fewer than k+1 surviving hits.  With
    alpha_mask=True, coverage-mask-rejected candidates never enter the
    list (tris_packed must carry AUX masks).  `fine_mask_rows` (int32
    rows, pack_fine_mask_rows) additionally enables the two-plane fine
    test + opaque pruning bound — slots then hold the K nearest fine-PASS
    hits at t <= the nearest opaque-plane hit."""
    return _trace_multihit(bvh8.rows, tris_packed, o, d,
                           jnp.asarray(t_min, jnp.float32),
                           jnp.asarray(t_max, jnp.float32),
                           bvh8.max_leaf, bvh8.depth, k_hits,
                           cull_backface,
                           packet_sublanes=packet_sublanes,
                           alpha_mask=alpha_mask,
                           width=getattr(bvh8, "width", 8),
                           fine_mask_rows=fine_mask_rows)


# ---------------------------------------------------------------------------
# Streamed-treelet kernel: per-packet treelet selection via scalar prefetch
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("max_leaf", "depth", "cull_backface", "any_hit",
                     "packet_sublanes", "shade_mode", "alpha_mask"))
def _trace_packed8_treelet(node_stack, tri_stack, pid, o, d, tmn, tmx,
                           max_leaf: int, depth: int,
                           cull_backface: bool, any_hit: bool = False,
                           packet_sublanes: int = SUBLANES,
                           shade_stack=None, shade_mode: int = 0,
                           alpha_mask: bool = False):
    """One round of streamed-treelet traversal.

    Unlike _trace_packed8 (whole tree resident in VMEM), the node/tri
    tables live stacked per-treelet in HBM — (K, S, 128) / (K, R, 128) —
    and each PACKET's blocks are DMA'd on demand: `pid[p]` (scalar
    prefetch) drives the BlockSpec index_map, so the Mosaic pipeline
    streams exactly the treelet each packet needs, skipping the copy when
    consecutive packets want the same treelet (the scheduler sorts rays
    so runs are long).  This is the TPU analog of persistent-thread ray
    queues: it lifts the VMEM ceiling on scene size without chunk sweeps.

    Rays arrive pre-padded: o/d/tmn/tmx are (P*subl*128,) component
    arrays, pid is (P,) int32 in [0, K).  Triangle ids in the output are
    TREELET-LOCAL (caller adds the treelet's triangle offset).
    """
    count = o.shape[0]
    block = LANES * packet_sublanes
    assert count % block == 0
    rows = count // LANES
    packets = rows // packet_sublanes
    comps = [c.reshape(rows, LANES)
             for c in (o[:, 0], o[:, 1], o[:, 2],
                       d[:, 0], d[:, 1], d[:, 2], tmn, tmx)]

    def ray_map(i, pid_ref):
        return (i, 0)

    def table_map(i, pid_ref):
        return (pid_ref[i], 0, 0)

    ray_spec = pl.BlockSpec((packet_sublanes, LANES), ray_map,
                            memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec((None,) + node_stack.shape[1:], table_map)
    tri_spec = pl.BlockSpec((None,) + tri_stack.shape[1:], table_map)

    kernel = functools.partial(
        _kernel8_treelet, max_leaf=max_leaf,
        cull_backface=cull_backface, any_hit=any_hit,
        shade_mode=shade_mode, alpha_mask=alpha_mask)

    f32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    out_shape = [f32tile, f32tile, f32tile, i32tile]
    if shade_mode:
        out_shape += [f32tile, f32tile, f32tile, i32tile]
    if shade_mode == 2:
        out_shape += [f32tile] * 6

    vmem = lambda dt: pltpu.VMEM((packet_sublanes, LANES), dt)
    scratch = [
        pltpu.SMEM((8 * depth + 16,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),
        vmem(jnp.int32),
    ]
    if shade_mode:
        scratch += [vmem(jnp.float32)] * 5
    if shade_mode == 2:
        scratch += [vmem(jnp.float32)] * 6

    inputs = [node_stack, tri_stack]
    in_specs = [node_spec, tri_spec]
    if shade_mode:
        inputs.append(shade_stack)
        in_specs.append(
            pl.BlockSpec((None,) + shade_stack.shape[1:], table_map))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(packets,),
        in_specs=in_specs + [ray_spec] * 8,
        out_specs=[ray_spec] * len(out_shape),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(pid, *inputs, *comps)

    flat = [x.reshape(-1) for x in outs]
    t, u, v, idx = flat[:4]
    rec = {"t": t, "tri": idx, "u": u, "v": v, "hit": idx >= 0}
    if shade_mode:
        nx, ny, nz, mat = flat[4:8]
        rec["n"] = jnp.stack([nx, ny, nz], axis=-1)
        rec["mat"] = mat
    if shade_mode == 2:
        tx, ty, tz, ux, uy, uvd = flat[8:14]
        rec["tan"] = jnp.stack([tx, ty, tz], axis=-1)
        rec["uv"] = jnp.stack([ux, uy], axis=-1)
        rec["uvd"] = uvd
    return rec


def _kernel8_treelet(pid_ref, *refs, max_leaf: int, cull_backface: bool,
                     any_hit: bool, shade_mode: int,
                     alpha_mask: bool = False):
    """Treelet kernel body = the flat BVH8 body; the prefetched pid ref is
    consumed by the BlockSpec index maps, not the kernel."""
    del pid_ref
    _traverse_kernel8(*refs, max_leaf=max_leaf,
                      cull_backface=cull_backface, any_hit=any_hit,
                      shade_mode=shade_mode, shared_origin=False,
                      alpha_mask=alpha_mask)


# ---------------------------------------------------------------------------
# Two-level kernel: instance TLAS over object-space BLAS (accel.instances)
# ---------------------------------------------------------------------------

_INST_LEAF_BITS = 19  # tri_row bits in instanced leaf encodings (6M tris)

# inst_trace row layout (accel.instances.InstancedTables.inst_trace,
# (I, 48) f32 — a VMEM row is 128 lanes regardless, so the widening from
# 16 is free):
#   0:12   inverse world transform, 3x4 row-major
#   12     BLAS root supernode id (unified table)
#   13     double-sided flag
#   14     material id
#   15     1 / uniform scale   (uv-density world correction)
#   16:25  normal matrix       (inverse-transpose linear, row-major)
#   25:34  world linear matrix (tangent rotation, mode 2)
_INST_COLS = 48


def _traverse_kernel8_inst(*refs, max_leaf: int, cull_backface: bool,
                           any_hit: bool = False, shade_mode: int = 0):
    """Two-level packet traversal (instance TLAS -> object-space BLAS).

    Stack entries (int32): >= 0 is a unified supernode id (TLAS rows
    first, then BLAS rows — accel.instances; the scalar n_tlas input
    splits the ranges).  Negative entries encode enc = -entry - 1 with
    tag = enc & 1, payload = enc >> 1:
      tag 0: triangle leaf, payload = tri_row | count << 19
      tag 1: instance enter (payload = instance id): transform the whole
             packet into the instance's object space (uniform scalar
             reads from inst_ref) and push the BLAS root.

    There is NO restore entry: TLAS supernodes slab-test against the
    world-space ray refs and BLAS supernodes/leaves against the current
    instance's object-space scratch (the id-threshold scalar branch is
    free next to the transform the old restore sentinel re-ran per
    instance).  LIFO bracketing guarantees a BLAS subtree is fully
    traversed before the next instance-enter pops, so one object-space
    scratch suffices.  t is the world ray parameter throughout (affine
    transform, unnormalized object direction), so best-t pruning works
    across levels.  Triangle facing uses OBJECT-space winding — Vulkan's
    default (no FLIP_FACING instance bit in the reference).

    shade_mode > 0 fuses shading like the single-level kernel: object-
    space vertex attributes are interpolated per candidate hit and
    rotated into world space with the instance's normal matrix (uniform
    scalars stashed at instance-enter), the material id comes from the
    instance row, and the winner is kept by select — no post-trace
    gathers at all.  Mode 1 emits (world normal, material id); mode 2
    adds (world tangent, uv, uv density).
    """
    f32 = jnp.float32
    it = iter(refs)
    n_tlas_ref = next(it)
    snodes_ref = next(it)
    tris_ref = next(it)
    inst_ref = next(it)
    shade_ref = next(it) if shade_mode else None
    ox, oy, oz, dx, dy, dz, tmn, tmx = (next(it) for _ in range(8))
    out_t, out_u, out_v, out_i, out_inst = (next(it) for _ in range(5))
    if shade_mode:
        out_nx, out_ny, out_nz, out_mat = (next(it) for _ in range(4))
    if shade_mode == 2:
        out_tx, out_ty, out_tz, out_ux, out_uy, out_uvd = (
            next(it) for _ in range(6))
    stack_ref = next(it)
    sp_ref = next(it)
    scal_ref = next(it)   # SMEM f32: [ds, mat, uvds, nm(9) @3:12, wl(9)]
    cur_inst_ref = next(it)
    bt_ref, bu_ref, bv_ref, bi_ref, binst_ref = (next(it) for _ in range(5))
    cox, coy, coz, cdx, cdy, cdz = (next(it) for _ in range(6))
    civx, civy, civz = (next(it) for _ in range(3))
    ivx, ivy, ivz = (next(it) for _ in range(3))
    if shade_mode:
        bnx_ref, bny_ref, bnz_ref, bmat_ref, bdet_ref = (
            next(it) for _ in range(5))
    if shade_mode == 2:
        btx_ref, bty_ref, btz_ref, bux_ref, buy_ref, buvd_ref = (
            next(it) for _ in range(6))

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                               jnp.where(d < 0, -1e-12, 1e-12), d)

    n_tlas = n_tlas_ref[0]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    # World-space inverse directions persist for every TLAS pop.
    ivx[:] = safe_inv(d_x)
    ivy[:] = safe_inv(d_y)
    ivz[:] = safe_inv(d_z)

    bt_ref[:] = tmx[:]
    bu_ref[:] = jnp.zeros_like(tmx[:])
    bv_ref[:] = jnp.zeros_like(tmx[:])
    bi_ref[:] = jnp.full(tmx.shape, -1, jnp.int32)
    binst_ref[:] = jnp.full(tmx.shape, -1, jnp.int32)
    if shade_mode:
        bnx_ref[:] = jnp.zeros_like(tmx[:])
        bny_ref[:] = jnp.zeros_like(tmx[:])
        bnz_ref[:] = jnp.ones_like(tmx[:])
        bmat_ref[:] = jnp.zeros_like(tmx[:])
        bdet_ref[:] = jnp.ones_like(tmx[:])
    if shade_mode == 2:
        btx_ref[:] = jnp.ones_like(tmx[:])
        bty_ref[:] = jnp.zeros_like(tmx[:])
        btz_ref[:] = jnp.zeros_like(tmx[:])
        bux_ref[:] = jnp.zeros_like(tmx[:])
        buy_ref[:] = jnp.zeros_like(tmx[:])
        buvd_ref[:] = jnp.zeros_like(tmx[:])

    stack_ref[0] = 0
    sp_ref[0] = 1
    cur_inst_ref[0] = -1
    scal_ref[0] = 0.0

    def slab_sort_push(row, use_world):
        """8-child slab test + ordered push (shared by both levels)."""
        big = jnp.float32(3.0e38)
        keys = []
        vals = []
        for c in range(8):
            off = 16 * c
            if use_world:
                t0x = (row[off + 0] - o_x) * ivx[:]
                t1x = (row[off + 3] - o_x) * ivx[:]
                t0y = (row[off + 1] - o_y) * ivy[:]
                t1y = (row[off + 4] - o_y) * ivy[:]
                t0z = (row[off + 2] - o_z) * ivz[:]
                t1z = (row[off + 5] - o_z) * ivz[:]
            else:
                t0x = (row[off + 0] - cox[:]) * civx[:]
                t1x = (row[off + 3] - cox[:]) * civx[:]
                t0y = (row[off + 1] - coy[:]) * civy[:]
                t1y = (row[off + 4] - coy[:]) * civy[:]
                t0z = (row[off + 2] - coz[:]) * civz[:]
                t1z = (row[off + 5] - coz[:]) * civz[:]
            near = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x),
                            jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z))
            far = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x),
                            jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z))
            hit = (near <= far) & (far >= tmn[:]) & (near <= bt_ref[:])
            meta0 = row[off + 6].astype(jnp.int32)
            meta1 = row[off + 7].astype(jnp.int32)
            near_min = jnp.min(jnp.where(hit, near, big))
            is_leaf_child = meta1 > 0
            is_inst_child = meta1 < 0
            leaf_enc = -((((meta0 // TRI_PER_ROW)
                           | (meta1 << _INST_LEAF_BITS)) << 1) + 1)
            inst_enc = -(((meta0 << 1) | 1) + 1)
            entry_val = jnp.where(
                is_leaf_child, leaf_enc,
                jnp.where(is_inst_child, inst_enc, meta0))
            keys.append(jnp.where(meta0 >= 0, near_min, big))
            vals.append(entry_val)

        network = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
                   (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (1, 5),
                   (2, 6), (3, 7), (2, 4), (3, 5), (1, 2), (3, 4),
                   (5, 6)]
        for i, j in network:
            swap = keys[i] < keys[j]
            ki = jnp.where(swap, keys[j], keys[i])
            kj = jnp.where(swap, keys[i], keys[j])
            vi = jnp.where(swap, vals[j], vals[i])
            vj = jnp.where(swap, vals[i], vals[j])
            keys[i], keys[j] = ki, kj
            vals[i], vals[j] = vi, vj

        for c in range(8):
            do_push = keys[c] < big
            s = sp_ref[0]
            stack_ref[s] = vals[c]
            sp_ref[0] = s + do_push.astype(jnp.int32)

    def cond(_):
        return sp_ref[0] > 0

    def body(_):
        sp = sp_ref[0]
        entry = stack_ref[sp - 1]
        sp_ref[0] = sp - 1

        @pl.when(entry >= 0)
        def _supernode():
            row = snodes_ref[entry]

            @pl.when(entry < n_tlas)
            def _tlas():
                slab_sort_push(row, use_world=True)

            @pl.when(entry >= n_tlas)
            def _blas():
                slab_sort_push(row, use_world=False)

        @pl.when(entry < 0)
        def _encoded():
            enc = -entry - 1
            tag = enc & 1
            payload = enc >> 1

            @pl.when(tag == 0)
            def _leaf():
                row_base = payload & ((1 << _INST_LEAF_BITS) - 1)
                cnt = payload >> _INST_LEAF_BITS
                inst = cur_inst_ref[0]
                inst_ds = scal_ref[0]

                def intersect_row(r):
                    trow = tris_ref[row_base + r]
                    if shade_mode == 1:
                        srow0 = shade_ref[row_base + r]
                    elif shade_mode == 2:
                        srows = [
                            shade_ref[
                                (row_base + r) * SHADE2_ROWS_PER_TRI_ROW
                                + k]
                            for k in range(SHADE2_ROWS_PER_TRI_ROW)]
                    for j in range(TRI_PER_ROW):
                        l = r * TRI_PER_ROW + j
                        off = TRI_STRIDE * j
                        v0x = trow[off + 0]
                        v0y = trow[off + 1]
                        v0z = trow[off + 2]
                        e1x = trow[off + 3]
                        e1y = trow[off + 4]
                        e1z = trow[off + 5]
                        e2x = trow[off + 6]
                        e2y = trow[off + 7]
                        e2z = trow[off + 8]
                        ds = jnp.maximum(trow[off + 9], inst_ds)

                        px = cdy[:] * e2z - cdz[:] * e2y
                        py = cdz[:] * e2x - cdx[:] * e2z
                        pz = cdx[:] * e2y - cdy[:] * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        if cull_backface:
                            facing = (det > _DET_EPS) | (
                                (ds > 0.5) & (jnp.abs(det) > _DET_EPS))
                        else:
                            facing = jnp.abs(det) > _DET_EPS
                        inv_det = 1.0 / jnp.where(
                            jnp.abs(det) > _DET_EPS, det, 1.0)
                        tx = cox[:] - v0x
                        ty = coy[:] - v0y
                        tz = coz[:] - v0z
                        u = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        v = (cdx[:] * qx + cdy[:] * qy
                             + cdz[:] * qz) * inv_det
                        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        hit = (facing & (u >= 0.0) & (v >= 0.0)
                               & (u + v <= 1.0) & (t >= tmn[:])
                               & (t <= bt_ref[:]) & (l < cnt))
                        if any_hit:
                            # Any-hit lane kill — see the single-level
                            # kernel's occlusion-query note.
                            bt_ref[:] = jnp.where(
                                hit, jnp.float32(-3e38), bt_ref[:])
                        else:
                            bt_ref[:] = jnp.where(hit, t, bt_ref[:])
                        bu_ref[:] = jnp.where(hit, u, bu_ref[:])
                        bv_ref[:] = jnp.where(hit, v, bv_ref[:])
                        bi_ref[:] = jnp.where(
                            hit, row_base * TRI_PER_ROW + jnp.int32(l),
                            bi_ref[:])
                        binst_ref[:] = jnp.where(hit, inst, binst_ref[:])
                        if shade_mode:
                            if shade_mode == 1:
                                srow, soff = srow0, off
                            else:
                                srow = srows[j // SHADE2_PER_ROW]
                                soff = SHADE2_STRIDE * (j % SHADE2_PER_ROW)
                            # Interpolate OBJECT-space attributes, rotate
                            # into world with the instance's (uniform
                            # scalar) normal matrix.  det keeps its
                            # object-space sign: d_world . n_world ==
                            # d_obj . n_obj under n_world = inv(L)^T
                            # n_obj, so the winding flip is unchanged.
                            wb = 1.0 - u - v
                            nx = (srow[soff + 0] * wb + srow[soff + 3] * u
                                  + srow[soff + 6] * v)
                            ny = (srow[soff + 1] * wb + srow[soff + 4] * u
                                  + srow[soff + 7] * v)
                            nz = (srow[soff + 2] * wb + srow[soff + 5] * u
                                  + srow[soff + 8] * v)
                            wx = (scal_ref[3] * nx + scal_ref[4] * ny
                                  + scal_ref[5] * nz)
                            wy = (scal_ref[6] * nx + scal_ref[7] * ny
                                  + scal_ref[8] * nz)
                            wz = (scal_ref[9] * nx + scal_ref[10] * ny
                                  + scal_ref[11] * nz)
                            bnx_ref[:] = jnp.where(hit, wx, bnx_ref[:])
                            bny_ref[:] = jnp.where(hit, wy, bny_ref[:])
                            bnz_ref[:] = jnp.where(hit, wz, bnz_ref[:])
                            bmat_ref[:] = jnp.where(
                                hit, scal_ref[1], bmat_ref[:])
                            bdet_ref[:] = jnp.where(hit, det, bdet_ref[:])
                        if shade_mode == 2:
                            tx0 = (srow[soff + 10] * wb
                                   + srow[soff + 13] * u
                                   + srow[soff + 16] * v)
                            ty0 = (srow[soff + 11] * wb
                                   + srow[soff + 14] * u
                                   + srow[soff + 17] * v)
                            tz0 = (srow[soff + 12] * wb
                                   + srow[soff + 15] * u
                                   + srow[soff + 18] * v)
                            # Tangents rotate with the plain linear part.
                            btx_ref[:] = jnp.where(
                                hit, scal_ref[12] * tx0 + scal_ref[13] * ty0
                                + scal_ref[14] * tz0, btx_ref[:])
                            bty_ref[:] = jnp.where(
                                hit, scal_ref[15] * tx0 + scal_ref[16] * ty0
                                + scal_ref[17] * tz0, bty_ref[:])
                            btz_ref[:] = jnp.where(
                                hit, scal_ref[18] * tx0 + scal_ref[19] * ty0
                                + scal_ref[20] * tz0, btz_ref[:])
                            bux_ref[:] = jnp.where(
                                hit, srow[soff + 19] * wb
                                + srow[soff + 21] * u
                                + srow[soff + 23] * v, bux_ref[:])
                            buy_ref[:] = jnp.where(
                                hit, srow[soff + 20] * wb
                                + srow[soff + 22] * u
                                + srow[soff + 24] * v, buy_ref[:])
                            buvd_ref[:] = jnp.where(
                                hit, srow[soff + 25] * scal_ref[2],
                                buvd_ref[:])

                # Row gating: see the single-level kernel — leaves rarely
                # hold max_leaf triangles, so skip whole rows beyond the
                # actual count.
                intersect_row(0)
                for r in range(1, -(-max_leaf // TRI_PER_ROW)):
                    pl.when(cnt > r * TRI_PER_ROW)(
                        functools.partial(intersect_row, r))
                if any_hit:
                    @pl.when(jnp.all((bi_ref[:] >= 0)
                                     | (tmx[:] < tmn[:])))
                    def _done():
                        sp_ref[0] = 0

            @pl.when(tag == 1)
            def _instance():
                iid = payload
                a00 = inst_ref[iid, 0]
                a01 = inst_ref[iid, 1]
                a02 = inst_ref[iid, 2]
                b0 = inst_ref[iid, 3]
                a10 = inst_ref[iid, 4]
                a11 = inst_ref[iid, 5]
                a12 = inst_ref[iid, 6]
                b1 = inst_ref[iid, 7]
                a20 = inst_ref[iid, 8]
                a21 = inst_ref[iid, 9]
                a22 = inst_ref[iid, 10]
                b2 = inst_ref[iid, 11]
                cox[:] = a00 * o_x + a01 * o_y + a02 * o_z + b0
                coy[:] = a10 * o_x + a11 * o_y + a12 * o_z + b1
                coz[:] = a20 * o_x + a21 * o_y + a22 * o_z + b2
                cdx[:] = a00 * d_x + a01 * d_y + a02 * d_z
                cdy[:] = a10 * d_x + a11 * d_y + a12 * d_z
                cdz[:] = a20 * d_x + a21 * d_y + a22 * d_z
                civx[:] = safe_inv(cdx[:])
                civy[:] = safe_inv(cdy[:])
                civz[:] = safe_inv(cdz[:])
                cur_inst_ref[0] = iid
                scal_ref[0] = inst_ref[iid, 13]
                if shade_mode:
                    scal_ref[1] = inst_ref[iid, 14]
                    scal_ref[2] = inst_ref[iid, 15]
                    for k in range(9):
                        scal_ref[3 + k] = inst_ref[iid, 16 + k]
                if shade_mode == 2:
                    for k in range(9):
                        scal_ref[12 + k] = inst_ref[iid, 25 + k]
                s = sp_ref[0]
                stack_ref[s] = inst_ref[iid, 12].astype(jnp.int32)
                sp_ref[0] = s + 1
        return 0

    jax.lax.while_loop(cond, body, 0)

    found = bi_ref[:] >= 0
    out_t[:] = jnp.where(found, bt_ref[:], f32(-1.0))
    out_u[:] = bu_ref[:]
    out_v[:] = bv_ref[:]
    out_i[:] = bi_ref[:]
    out_inst[:] = binst_ref[:]
    if shade_mode:
        # Normalize + backface flip (ClosestHit.rchit:67-70); the normal
        # matrix rotation preserves the object-space winding sign.
        n2 = (bnx_ref[:] * bnx_ref[:] + bny_ref[:] * bny_ref[:]
              + bnz_ref[:] * bnz_ref[:])
        sgn = jnp.where(bdet_ref[:] < 0.0, f32(-1.0), f32(1.0))
        inv_n = sgn * jax.lax.rsqrt(jnp.maximum(n2, 1e-20))
        out_nx[:] = bnx_ref[:] * inv_n
        out_ny[:] = bny_ref[:] * inv_n
        out_nz[:] = bnz_ref[:] * inv_n
        out_mat[:] = bmat_ref[:].astype(jnp.int32)
    if shade_mode == 2:
        t2 = (btx_ref[:] * btx_ref[:] + bty_ref[:] * bty_ref[:]
              + btz_ref[:] * btz_ref[:])
        inv_t = jax.lax.rsqrt(jnp.maximum(t2, 1e-20))
        out_tx[:] = btx_ref[:] * inv_t
        out_ty[:] = bty_ref[:] * inv_t
        out_tz[:] = btz_ref[:] * inv_t
        out_ux[:] = bux_ref[:]
        out_uy[:] = buy_ref[:]
        out_uvd[:] = buvd_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("max_leaf", "depth", "cull_backface", "any_hit",
                     "packet_sublanes", "shade_mode"))
def _trace_packed8_inst(n_tlas, snode_rows, tris_packed, inst_trace, o, d,
                        t_min, t_max, max_leaf: int, depth: int,
                        cull_backface: bool, any_hit: bool = False,
                        packet_sublanes: int = SUBLANES,
                        shade_rows: jnp.ndarray | None = None,
                        shade_mode: int = 0):
    count = o.shape[0]
    block = LANES * packet_sublanes
    padded = -(-count // block) * block
    pad = padded - count

    def prep(x, fill=0.0):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    o = prep(o)
    d = prep(d, 1.0)
    tmn = prep(jnp.broadcast_to(t_min, (count,)))
    # Pad lanes must trace nothing: -3e38 guarantees root rejection
    # (-1.0 still descends nodes spanning >1 unit behind the origin).
    tmx = prep(jnp.broadcast_to(t_max, (count,)), -3.0e38)

    rows = padded // LANES
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmn, tmx]
    comps = [c.reshape(rows, LANES) for c in comps]

    grid = (rows // packet_sublanes,)
    ray_spec = pl.BlockSpec((packet_sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _traverse_kernel8_inst, max_leaf=max_leaf,
        cull_backface=cull_backface, any_hit=any_hit,
        shade_mode=shade_mode)

    tile = (packet_sublanes, LANES)
    f32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    i32tile = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    out_shape = [f32tile, f32tile, f32tile, i32tile, i32tile]
    if shade_mode:
        out_shape += [f32tile, f32tile, f32tile, i32tile]
    if shade_mode == 2:
        out_shape += [f32tile] * 6

    vmem = lambda dt: pltpu.VMEM(tile, dt)
    scratch = [
        pltpu.SMEM((8 * depth + 32,), jnp.int32),  # encoded stack
        pltpu.SMEM((1,), jnp.int32),               # stack pointer
        pltpu.SMEM((24,), jnp.float32),            # instance scalars
        pltpu.SMEM((1,), jnp.int32),               # current instance
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),  # best tuv
        vmem(jnp.int32), vmem(jnp.int32),          # best tri / instance
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),  # cur o
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),  # cur d
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),  # cur 1/d
        vmem(jnp.float32), vmem(jnp.float32), vmem(jnp.float32),  # world 1/d
    ]
    if shade_mode:
        scratch += [vmem(jnp.float32)] * 5     # bn xyz, bmat, bdet
    if shade_mode == 2:
        scratch += [vmem(jnp.float32)] * 6     # bt xyz, buv xy, buvd

    inputs = [jnp.asarray(n_tlas, jnp.int32).reshape(1),
              snode_rows, tris_packed, inst_trace]
    in_specs = [smem, full, full, full]
    if shade_mode:
        inputs.append(shade_rows)
        in_specs.append(full)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs + [ray_spec] * 8,
        out_specs=[ray_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),

    )(*inputs, *comps)

    def unpad(x):
        return x.reshape(-1)[:count]

    t, u, v, idx, inst = (unpad(x) for x in outs[:5])
    rec = {"t": t, "tri": idx, "u": u, "v": v, "hit": idx >= 0,
           "inst": inst}
    if shade_mode:
        nx, ny, nz, mat = (unpad(x) for x in outs[5:9])
        rec["n"] = jnp.stack([nx, ny, nz], axis=-1)
        rec["mat"] = mat
    if shade_mode == 2:
        tx, ty, tz, ux, uy, uvd = (unpad(x) for x in outs[9:15])
        rec["tan"] = jnp.stack([tx, ty, tz], axis=-1)
        rec["uv"] = jnp.stack([ux, uy], axis=-1)
        rec["uvd"] = uvd
    return rec


def trace_nearest_packet8_inst(tables, o, d, t_min, t_max,
                               cull_backface: bool = True,
                               any_hit: bool = False,
                               packet_sublanes: int = SUBLANES):
    """Two-level packet traversal over accel.instances.InstancedTables.
    Occlusion queries (any_hit) skip the fused-shading outputs."""
    mode = 0 if any_hit else tables.shade_mode
    return _trace_packed8_inst(
        tables.n_tlas, tables.snode_rows, tables.tris_packed,
        tables.inst_trace, o, d,
        jnp.asarray(t_min, jnp.float32), jnp.asarray(t_max, jnp.float32),
        tables.max_leaf, tables.depth, cull_backface, any_hit,
        packet_sublanes=packet_sublanes,
        shade_rows=tables.shade_rows, shade_mode=mode)
