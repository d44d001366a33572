"""Tile-binned rasterized primary visibility for the hybrid G-buffer.

The reference's hybrid mode RASTERIZES the G-buffer (a Vulkan graphics
pipeline over the opaque scene, GBufferStage.cpp:147-157 +
GBuffer.vert/.frag) and only ray-traces shadows; steeljax round 1-3
emulated the raster stage with a primary-ray trace, which is exact but
pays full BVH packet traversal for the most coherent rays in the frame
(~64 ms of the 145 ms 1080p frame).  This module is the actual raster
analog, built the TPU way:

 1. VERTEX STAGE (dense XLA): transform every triangle to clip space in
    one batched matmul, clip against the near plane (at most 2 pieces
    per triangle, carrying ORIGINAL-triangle barycentrics so shading
    attributes interpolate exactly), and precompute per-piece
    screen-space linear forms: 3 edge functions (inside test), Fw
    (perspective 1/w), Fu/Fv (perspective-correct original
    barycentrics), and reverse-z NDC depth — each a (a, b, c) triple
    evaluated as a*sx + b*sy + c.
 2. BIN (one device sort): each piece gets a key = its MIN covered
    subtile (32x24 px); pieces spanning more than a 2x2 subtile
    neighborhood go to a global "big" segment, culled/degenerate pieces
    to the tail.  One sort of the keys + a row gather orders the record
    table; searchsorted yields per-subtile segment offsets.  There is
    NO per-tile duplication: a subtile tests its own segment plus the
    neighbor segments that can reach it (the same "one stable sort, no
    per-array gathers" rule the PT wavefront repack follows).
 3. RASTER (XLA map over subtiles): each subtile's 768 pixels evaluate
    their candidate segments in WINDOW-piece slices — one (768,3) @
    (3,7*W) MXU matmul per slice yields every linear form, the
    z-buffer is a running exact-z max, and the winner's Fu/Fv/Fw/tri
    are extracted in-loop by equality-select against ONE pinned
    winning piece (so coplanar exact-z ties never mix attributes).
    Slice loops are fori_loops with data-dependent trip counts, so
    arbitrarily dense subtiles and arbitrarily long big segments are
    CORRECT by construction — no static budgets to overflow (the
    32x8/128-piece windowed first cut overflowed on the 1080p bench
    scene).  Subtiles are processed in descending-density order so
    each vmapped chunk runs a uniform trip count.
 4. RESOLVE: u = Fu/Fw, v = Fv/Fw, w_eye = 1/Fw per pixel — no winner
    gather.

STATUS: opt-in (STEELJAX_RASTER=1).  Measured on-chip this loses to
the packet-traced primary pass (~310 ms vs 64 ms at 1080p/220k tris);
the ablation and the two structural reasons live in ARCHITECTURE.md
"Hybrid rendering".  Kept as the parity analog of the reference's
raster G-buffer pipeline, oracle-tested exact on CPU.

Outputs match trace_nearest's contract ({hit, tri, t, u, v}, misses at
t=-1/tri=-1), so the G-buffer's alpha-test retrace and shading paths are
unchanged.  Documented deviations from the traced oracle: near/far
clipping is planar (z_eye) rather than radial (ray t), and exact-z ties
(coplanar overlap, shared edges) resolve by record order rather than the
trace's traversal order — both affect isolated edge pixels, bounded by
tests/test_raster.py's mismatch budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Subtile = the binning granule AND the pixel group one map step
# rasterizes (32x24 px = 768 lanes).  It must be tall enough that
# ordinary close-up triangles stay within the 2x2-subtile span cap: at
# 32x8 the 1080p bench scene sent 4k pieces (every tri taller than
# ~16 px) to the global big segment; at 32x24 (pieces up to ~64x48 px
# bin locally) the same frame has ~370.  24 divides 720 and 1080.
TILE_W = 32
TILE_H = 24
PX = TILE_W * TILE_H
SPAN = 2      # max subtile span (cols AND rows) before a piece is "big"
WINDOW = 256  # pieces evaluated per slice (one MXU matmul per slice)
_MAP_BATCH = 64  # subtiles vmapped per map step (density-sorted)
_KEY_BIG = np.int32(1 << 29)
_KEY_CULL = np.int32(1 << 30)
_REC_COLS = 24


def supported(width: int, height: int) -> bool:
    """Raster engages only on frames that tile exactly into 32x24 pixel
    subtiles (1280x720 and 1920x1080 both do); anything else keeps the
    traced path."""
    return width % TILE_W == 0 and height % TILE_H == 0


@jax.tree_util.register_pytree_node_class
class RasterScene:
    """Device-resident per-triangle raster inputs (built once per scene
    by prepare_raster): world-space vertices and the raster-visibility
    mask (pads and alpha-BLEND materials excluded — blend surfaces
    belong to the forward stage, GBufferStage.cpp:147-157)."""

    def __init__(self, v0, e1, e2, double_sided, in_raster):
        self.v0 = v0
        self.e1 = e1
        self.e2 = e2
        self.double_sided = double_sided
        self.in_raster = in_raster

    def tree_flatten(self):
        return ((self.v0, self.e1, self.e2, self.double_sided,
                 self.in_raster), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def prepare_raster(flat, tables) -> RasterScene | None:
    """Build the device-side raster inputs, or None when the tables
    cannot supply them (instanced/treelet paths keep the traced
    G-buffer).

    On the TPU path vertices are DECODED from the already-resident
    packed triangle rows (pack_tris records: v0, e1, e2, aux at lanes
    0..9) — zero extra host->device upload; the CPU/test and
    multi-chunk paths upload flat.tri_pos directly."""
    from steeljax.accel.bvh import TRI_PER_ROW, TRI_STRIDE
    from steeljax.scene.material import MaterialFlags

    chunks = getattr(tables, "chunks", None)
    if chunks is None or tables.treelets is not None:
        return None

    t_count = flat.tri_pos.shape[0]
    flags = np.asarray(flat.tri_shade[:, 40]).astype(np.int64)
    in_raster = (flags & int(MaterialFlags.ALPHA_BLEND)) == 0
    # Pad slots (tri_pos parked at _PAD_VALUE) are excluded on device by
    # the vertex-magnitude cull; mask them here too for clarity.
    in_raster &= np.asarray(flat.tri_pos[:, 0, 0]) < 3.0e36

    packed = getattr(chunks[0], "tris_packed", None)
    if (packed is not None and getattr(tables, "use_pallas", False)
            and len(chunks) == 1):
        rows = packed.reshape(-1, 128)[:, :TRI_PER_ROW * TRI_STRIDE]
        recs = rows.reshape(-1, TRI_STRIDE)[:t_count]
        v0, e1, e2 = recs[:, 0:3], recs[:, 3:6], recs[:, 6:9]
        aux = recs[:, 9].astype(jnp.int32)
        ds = (aux % 2) == 1  # aux = ds | mask << 1 (pack_tris)
    else:
        pos = jnp.asarray(np.asarray(flat.tri_pos, np.float32))
        v0 = pos[:, 0]
        e1 = pos[:, 1] - pos[:, 0]
        e2 = pos[:, 2] - pos[:, 0]
        ds = jnp.asarray(np.asarray(flat.tri_double_sided).astype(bool))
    return RasterScene(v0, e1, e2, ds, jnp.asarray(in_raster))


def _clip_near(p, bary, w_eps):
    """Clip one triangle (p: (T,3,4) clip verts, bary: (T,3,3) original
    barycentrics) against w >= w_eps.  Returns two pieces, each (verts
    (T,3,4), bary (T,3,3), valid (T,)) — piece B is degenerate unless
    the clip produced a quad.  Pure select chains (tiny-table rule)."""
    w = p[..., 3]
    inb = w >= w_eps                     # (T, 3)
    count = inb.astype(jnp.int32).sum(-1)

    # Rotate so that vertex order starts at a canonical inside vertex:
    # r = the inside vertex whose PREDECESSOR (in winding order) is
    # outside (unique for count 1 and 2; count 3 keeps order).
    v = [(p[:, i], bary[:, i], inb[:, i]) for i in range(3)]

    def rot(sel1, sel2):
        out = []
        for k in range(3):
            pk = jnp.where(sel1[:, None], v[(k + 1) % 3][0], v[k][0])
            pk = jnp.where(sel2[:, None], v[(k + 2) % 3][0], pk)
            bk = jnp.where(sel1[:, None], v[(k + 1) % 3][1], v[k][1])
            bk = jnp.where(sel2[:, None], v[(k + 2) % 3][1], bk)
            out.append((pk, bk))
        return out

    start1 = inb[:, 1] & ~inb[:, 0]
    start2 = inb[:, 2] & ~inb[:, 1]
    (p0, b0), (p1, b1), (p2, b2) = rot(start1, start2)
    w0, w1, w2 = p0[..., 3], p1[..., 3], p2[..., 3]

    def isect(pa, ba, wa, pb, bb, wb):
        t = (w_eps - wa) / jnp.where(jnp.abs(wb - wa) < 1e-30, 1e-30,
                                     wb - wa)
        t = jnp.clip(t, 0.0, 1.0)[:, None]
        return pa + (pb - pa) * t, ba + (bb - ba) * t

    # count==1: inside = {v0'}; piece A = (v0', i01, i20).
    i01_p, i01_b = isect(p0, b0, w0, p1, b1, w1)
    i20_p, i20_b = isect(p2, b2, w2, p0, b0, w0)
    # count==2: inside = {v0', v1'}; quad (v0', v1', i12, i20) ->
    # A = (v0', v1', i12), B = (v0', i12, i20).
    i12_p, i12_b = isect(p1, b1, w1, p2, b2, w2)

    c1 = (count == 1)[:, None]
    c2 = (count == 2)[:, None]

    a1p = jnp.where(c1, i01_p, p1)
    a1b = jnp.where(c1, i01_b, b1)
    a2p = jnp.where(c1, i20_p, jnp.where(c2, i12_p, p2))
    a2b = jnp.where(c1, i20_b, jnp.where(c2, i12_b, b2))
    piece_a = (jnp.stack([p0, a1p, a2p], 1),
               jnp.stack([b0, a1b, a2b], 1),
               count >= 1)
    piece_b = (jnp.stack([p0, i12_p, i20_p], 1),
               jnp.stack([b0, i12_b, i20_b], 1),
               count == 2)
    return piece_a, piece_b


def _piece_records(pp, bb, valid, double_sided, width, height, ntx, nty):
    """Screen-space linear-form records for clipped pieces.

    Record columns (24 f32): [a,b,c] x {E0, E1, E2 (piece edges, scaled
    1/area2 so E(p) = piece barycentric), Fw (1/w), Fu, Fv (perspective
    original-bary u, v), Z (reverse-z NDC)} = 21, tri_id, bbox_min
    (tx0 + 4096*ty0), bbox_max.  Returns (records (T,24), key (T,))."""
    w = pp[..., 3]
    iw = 1.0 / w
    sx = (pp[..., 0] * iw + 1.0) * (0.5 * width)
    sy = (pp[..., 1] * iw + 1.0) * (0.5 * height)
    sz = pp[..., 2] * iw                       # reverse-z NDC in [0, 1]

    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    area2 = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    backface = area2 <= 0.0
    keep = valid & ~(backface & ~double_sided)
    # Degenerate / sliver pieces never win meaningfully; drop them.
    keep &= jnp.abs(area2) > 1e-7
    inv_a = 1.0 / jnp.where(jnp.abs(area2) < 1e-30, 1e-30, area2)

    def edge(xa, ya, xb, yb):
        """lambda-scaled edge form: a*sx + b*sy + c = signed twice-area
        of (p, a, b) / area2."""
        return ((ya - yb) * inv_a, (xb - xa) * inv_a,
                (xa * yb - xb * ya) * inv_a)

    e0 = edge(x1, y1, x2, y2)   # lambda_0
    e1 = edge(x2, y2, x0, y0)   # lambda_1
    e2 = edge(x0, y0, x1, y1)   # lambda_2
    lam = (e0, e1, e2)

    def interp(vals):
        """Linear form of sum_k lambda_k * vals[k]."""
        a = sum(lam[k][0] * vals[:, k] for k in range(3))
        b = sum(lam[k][1] * vals[:, k] for k in range(3))
        c = sum(lam[k][2] * vals[:, k] for k in range(3))
        return a, b, c

    fw = interp(iw)                       # 1/w at pixel
    fu = interp(iw * bb[..., 1])          # perspective-weighted orig u
    fv = interp(iw * bb[..., 2])
    fz = interp(sz)                       # screen-linear reverse-z

    # Subtile bbox from the piece's screen extent at pixel centers.
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    keep &= (xmax >= 0.0) & (xmin < width) & (ymax >= 0.0) & (ymin < height)
    keep &= jnp.isfinite(xmin) & jnp.isfinite(xmax)
    keep &= jnp.isfinite(ymin) & jnp.isfinite(ymax)
    tx0 = jnp.clip((xmin - 0.5) / TILE_W, 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip((xmax - 0.5) / TILE_W, 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip((ymin - 0.5) / TILE_H, 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip((ymax - 0.5) / TILE_H, 0, nty - 1).astype(jnp.int32)
    big = ((tx1 - tx0) >= SPAN) | ((ty1 - ty0) >= SPAN)

    key = jnp.where(keep, jnp.where(big, _KEY_BIG, ty0 * ntx + tx0),
                    _KEY_CULL)
    tri_id = jnp.arange(pp.shape[0] // 2, dtype=jnp.int32)
    tri_id = jnp.concatenate([tri_id, tri_id])  # caller stacks A then B
    cols = [e0[0], e0[1], e0[2], e1[0], e1[1], e1[2], e2[0], e2[1], e2[2],
            fw[0], fw[1], fw[2], fu[0], fu[1], fu[2], fv[0], fv[1], fv[2],
            fz[0], fz[1], fz[2],
            tri_id.astype(jnp.float32),
            (tx0 + 4096 * ty0).astype(jnp.float32),
            (tx1 + 4096 * ty1).astype(jnp.float32)]
    recs = jnp.stack(cols, axis=-1)
    recs = jnp.where(keep[:, None],
                     jnp.nan_to_num(recs, nan=0.0, posinf=0.0,
                                    neginf=0.0),
                     0.0)
    return recs, key


def _segments(offsets, tile_ids, ntx, nty):
    """Candidate segments for each subtile: its own and its reachable
    neighbors' sorted ranges — (row ty-1, cols tx-1..tx) and (row ty,
    cols tx-1..tx), clamped at borders.  Returns (startA, lenA, startB,
    lenB)."""
    ty = tile_ids // ntx
    tx = tile_ids % ntx
    c0 = jnp.maximum(tx - 1, 0)

    def seg(row, row_valid):
        row = jnp.clip(row, 0, nty - 1)
        start = offsets[row * ntx + c0]
        end = offsets[row * ntx + tx + 1]
        length = jnp.where(row_valid, end - start, 0)
        return start, length

    sa, la = seg(ty - 1, ty >= 1)
    sb, lb = seg(ty, jnp.ones_like(ty, bool))
    return sa, la, sb, lb


def _raster_tiles(recs_sorted, tile_ids, segments, ntx):
    """Rasterize one 32x24 subtile per map step.

    For each subtile: loop its candidate segments in WINDOW-piece
    slices; each slice evaluates all 7 linear forms for all pieces with
    one (768,3)@(3,7W) matmul, folds an exact running (z, tri) maximum,
    and extracts the winner's Fu/Fv/Fw/tri by equality-select — so no
    post-pass winner gather is needed.  Trip counts are data-dependent
    (fori_loop), so any density is handled — no static budget, no
    overflow."""
    sub = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 0)
    lane = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 1)

    def one_tile(args):
        tid, sa, la, sb, lb, gstart, glen = args
        segs = ((sa, la), (sb, lb), (gstart, glen))
        ty = tid // ntx
        tx = tid % ntx
        px = (tx * TILE_W + lane + 0.5).reshape(-1)
        py = (ty * TILE_H + sub + 0.5).reshape(-1)
        pmat = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # (768,3)

        def slice_eval(start, count, carry):
            """One WINDOW-piece slice starting at sorted row `start`."""
            bz, bu, bv, bw, bt = carry
            recs_w = jax.lax.dynamic_slice(
                recs_sorted, (start, 0), (WINDOW, _REC_COLS))
            coefs = recs_w[:, 0:21].reshape(WINDOW, 7, 3).transpose(
                2, 1, 0)
            vals = pmat @ coefs.reshape(3, 7 * WINDOW)          # (768,7W)
            vals = vals.reshape(-1, 7, WINDOW)
            e0, e1v, e2v = vals[:, 0], vals[:, 1], vals[:, 2]
            fw, fu, fv = vals[:, 3], vals[:, 4], vals[:, 5]
            z = vals[:, 6]
            # Piece-level masks are (W,): within the slice's live count
            # and bbox-covering this subtile.
            bmin = recs_w[:, 22].astype(jnp.int32)
            bmax = recs_w[:, 23].astype(jnp.int32)
            pok = (jnp.arange(WINDOW, dtype=jnp.int32) < count)
            pok &= (tx >= bmin % 4096) & (tx <= bmax % 4096)
            pok &= (ty >= bmin // 4096) & (ty <= bmax // 4096)
            inside = jnp.minimum(jnp.minimum(e0, e1v), e2v) >= 0.0
            inside &= (z > 0.0) & (z <= 1.0)
            zm = jnp.where(inside & pok[None, :], z, -1.0)
            sz = jnp.max(zm, axis=1)
            # Winner attributes by equality-select.  Exact-z ties
            # (coplanar pieces sharing an edge through the pixel
            # center) must not MIX attributes from different pieces,
            # so first pin ONE winning piece index, then select every
            # attribute from that piece.
            lidx = jnp.arange(WINDOW, dtype=jnp.int32)
            win = (zm == sz[:, None]) & (zm > 0.0)
            si = jnp.max(jnp.where(win, lidx[None, :], -1), axis=1)
            one = win & (lidx[None, :] == si[:, None])

            def pick(a):
                return jnp.max(jnp.where(one, a, -3.0e38), axis=1)

            su, sv, sw = pick(fu), pick(fv), pick(fw)
            st = pick(jnp.broadcast_to(recs_w[None, :, 21], zm.shape))
            take = sz > bz
            return (jnp.where(take, sz, bz), jnp.where(take, su, bu),
                    jnp.where(take, sv, bv), jnp.where(take, sw, bw),
                    jnp.where(take, st, bt))

        carry = (jnp.full((PX,), -1.0, jnp.float32),
                 jnp.zeros((PX,), jnp.float32),
                 jnp.zeros((PX,), jnp.float32),
                 jnp.full((PX,), 1.0, jnp.float32),
                 jnp.full((PX,), -1.0, jnp.float32))
        for start, length in segs:
            n = (length + WINDOW - 1) // WINDOW

            def body(i, c, start=start, length=length):
                return slice_eval(start + i * WINDOW,
                                  length - i * WINDOW, c)

            carry = jax.lax.fori_loop(0, n, body, carry)
        return carry

    # Batched map: a plain per-tile scan pays ~170 us of while-step
    # overhead per subtile (606 ms frames); vmapping chunks runs the
    # slice loops lockstep to the chunk's max trip count.  The CALLER
    # passes tile_ids ordered by descending segment length so each
    # chunk's tiles have similar density and the lockstep overrun is
    # small (unsorted, one dense tile drags 63 sparse ones through its
    # trip count).
    return jax.lax.map(one_tile, (tile_ids,) + tuple(segments),
                       batch_size=_MAP_BATCH)


def raster_visibility(rscene: RasterScene, view_proj, width: int,
                      height: int, camera_near):
    """Full-frame rasterized nearest-opaque visibility.

    Returns (hit, tri, u, v, w_eye) — each (H*W,) in RASTER ROW ORDER
    (row-major over (ty, tx, sub, lane) regrouped to (H, W); use
    `to_tiled` to match a tiled_order ray layout)."""
    ntx = width // TILE_W
    nty = height // TILE_H
    n_tiles = ntx * nty

    verts = jnp.stack([rscene.v0, rscene.v0 + rscene.e1,
                       rscene.v0 + rscene.e2], axis=1)     # (T, 3, 3)
    ones = jnp.ones(verts.shape[:2] + (1,), jnp.float32)
    clip = jnp.concatenate([verts, ones], -1) @ view_proj.T  # (T,3,4)
    bary = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None],
                            clip.shape[:1] + (3, 3))
    w_eps = jnp.maximum(jnp.asarray(camera_near, jnp.float32) * 0.5,
                        1e-4)
    (pa, ba, va), (pb, bbb, vb) = _clip_near(clip, bary, w_eps)
    valid = rscene.in_raster & (jnp.abs(rscene.v0[:, 0]) < 3.0e36)
    pp = jnp.concatenate([pa, pb], 0)
    bbs = jnp.concatenate([ba, bbb], 0)
    vv = jnp.concatenate([va & valid, vb & valid], 0)
    ds2 = jnp.concatenate([rscene.double_sided, rscene.double_sided], 0)
    recs, key = _piece_records(pp, bbs, vv, ds2, width, height, ntx, nty)

    perm = jnp.argsort(key)
    key_sorted = key[perm]
    recs_sorted = recs[perm]
    # Slices are static-size; pad so they always fit (pad rows sit past
    # every segment count and are masked out).
    recs_sorted = jnp.concatenate(
        [recs_sorted, jnp.zeros((WINDOW, _REC_COLS), jnp.float32)], 0)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    offsets = jnp.searchsorted(key_sorted, bounds).astype(jnp.int32)
    off_big = jnp.searchsorted(key_sorted, _KEY_BIG).astype(jnp.int32)
    off_cull = jnp.searchsorted(key_sorted, _KEY_CULL).astype(jnp.int32)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    sa, la, sb, lb = _segments(offsets, tile_ids, ntx, nty)
    gstart = jnp.full((n_tiles,), off_big, jnp.int32)
    glen = jnp.full((n_tiles,), off_cull - off_big, jnp.int32)
    # Process subtiles in DESCENDING density order so each vmapped map
    # chunk runs a uniform slice count (see _raster_tiles), then
    # inverse-permute the per-tile results back to raster order.
    order = jnp.argsort(-(la + lb))
    bz, fu, fv, fw, ft = _raster_tiles(
        recs_sorted, tile_ids[order],
        (sa[order], la[order], sb[order], lb[order], gstart, glen), ntx)
    inv = jnp.argsort(order)
    bz, fu, fv, fw, ft = (a[inv].reshape(-1)
                          for a in (bz, fu, fv, fw, ft))

    hit = bz > 0.0
    inv_fw = 1.0 / jnp.where(jnp.abs(fw) < 1e-30, 1e-30, fw)
    u = jnp.where(hit, fu * inv_fw, 0.0)
    v = jnp.where(hit, fv * inv_fw, 0.0)
    tri = jnp.where(hit, ft.astype(jnp.int32), -1)
    w_eye = jnp.where(hit, inv_fw, -1.0)
    return hit, tri, u, v, w_eye


def raster_stats(rscene: RasterScene, view_proj, width: int, height: int,
                 camera_near):
    """Binning statistics for tuning: (pieces, big_count, max_segment,
    mean_segment) on a representative frame."""
    ntx = width // TILE_W
    nty = height // TILE_H
    verts = jnp.stack([rscene.v0, rscene.v0 + rscene.e1,
                       rscene.v0 + rscene.e2], axis=1)
    ones = jnp.ones(verts.shape[:2] + (1,), jnp.float32)
    clip = jnp.concatenate([verts, ones], -1) @ view_proj.T
    bary = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None],
                            clip.shape[:1] + (3, 3))
    w_eps = jnp.maximum(jnp.asarray(camera_near, jnp.float32) * 0.5, 1e-4)
    (pa, ba, va), (pb, bbb, vb) = _clip_near(clip, bary, w_eps)
    valid = rscene.in_raster & (jnp.abs(rscene.v0[:, 0]) < 3.0e36)
    pp = jnp.concatenate([pa, pb], 0)
    bbs = jnp.concatenate([ba, bbb], 0)
    vv = jnp.concatenate([va & valid, vb & valid], 0)
    ds2 = jnp.concatenate([rscene.double_sided, rscene.double_sided], 0)
    _, key = _piece_records(pp, bbs, vv, ds2, width, height, ntx, nty)
    key_sorted = jnp.sort(key)
    bounds = jnp.arange(ntx * nty + 1, dtype=jnp.int32)
    offsets = jnp.searchsorted(key_sorted, bounds).astype(jnp.int32)
    off_big = jnp.searchsorted(key_sorted, _KEY_BIG)
    off_cull = jnp.searchsorted(key_sorted, _KEY_CULL)
    tile_ids = jnp.arange(ntx * nty, dtype=jnp.int32)
    _, la, _, lb = _segments(offsets, tile_ids, ntx, nty)
    seg = la + lb
    return {"pieces": int(off_cull), "big_count": int(off_cull - off_big),
            "max_segment": int(jnp.max(seg)),
            "mean_segment": float(jnp.mean(seg.astype(jnp.float32)))}


def to_tiled(arr, width: int, height: int, tile):
    """Raster row order (ty, tx, sub, lane ~ row-major (H, W)) ->
    tiled_order ray order for tile (tw, th), as pure reshape/transpose
    (never an index gather)."""
    tw, th = tile
    c = arr.shape[1:]
    frame = arr.reshape((height // TILE_H, width // TILE_W, TILE_H,
                         TILE_W) + c)
    frame = frame.transpose(0, 2, 1, 3, *range(4, 4 + len(c)))
    frame = frame.reshape((height, width) + c)
    r = frame.reshape((height // th, th, width // tw, tw) + c)
    return r.transpose(0, 2, 1, 3, *range(4, 4 + len(c))).reshape(
        (-1,) + c)


def raster_rec(rscene: RasterScene, view_proj, width: int,
               height: int, tile, d, camera_near):
    """trace_nearest-compatible rec from the raster, in the caller's
    tiled_order ray layout (tile = (tw, th)).  `d` = unit ray directions
    in that same layout.  Returns the rec dict."""
    hit, tri, u, v, w_eye = raster_visibility(
        rscene, view_proj, width, height, camera_near)
    hit = to_tiled(hit, width, height, tile)
    tri = to_tiled(tri, width, height, tile)
    u = to_tiled(u, width, height, tile)
    v = to_tiled(v, width, height, tile)
    w_eye = to_tiled(w_eye, width, height, tile)
    # w_clip = eye-forward distance (perspectiveRH_ZO: w_clip = -z_eye,
    # so view_proj row 3 = -view row 2 = the unit forward linear form);
    # t along the unit ray = w / (d . forward).
    fwd = view_proj[3, :3]
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
    cosf = jnp.maximum(jnp.sum(d * fwd, axis=-1), 1e-6)
    t = jnp.where(hit, w_eye / cosf, -1.0)
    rec = {"hit": hit, "tri": tri, "t": t,
           "u": jnp.clip(u, 0.0, 1.0), "v": jnp.clip(v, 0.0, 1.0)}
    return rec
