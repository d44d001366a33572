"""Per-triangle conservative alpha-coverage masks for in-kernel alpha
testing.

The reference rejects alpha-tested texels *inside* traversal — its any-hit
shader samples the base-color texture at the hit UV and ignores the hit
when alpha < cutoff (Source/Shaders/PathTracing/AnyHit.rahit:25-52), so a
ray pays ONE traversal regardless of how many transparent texels it
crosses.  steeljax's packet kernel cannot sample textures per candidate
hit (a per-hit atlas gather inside the leaf loop would serialize it), so
the TPU-native design is a precomputed CONSERVATIVE coverage mask in
*barycentric* space, packed into the spare bits of the triangle record's
aux lane (accel.pallas_traverse, lane 9):

* the (u, v) barycentric domain of each triangle is cut into a GRID x GRID
  cell grid; the CELLS cells intersecting {u >= 0, v >= 0, u + v <= 1} are
  enumerated triangularly (21 cells at GRID=6, fitting the aux lane's
  float-exact 2^24 integer budget next to the double-sided bit);
* a cell's bit is 0 only when EVERY bilinear alpha sample inside it is
  below the material cutoff (proved via a >=cutoff-texel integral image
  over the cell's dilated texel footprint — the bilinear field's max is
  bounded by the max of the texels it interpolates), so the kernel may
  drop bit-0 candidate hits without consulting the texture: the exact
  integrator test (render.pt.integrator._alpha_rejected) would have
  rejected them too;
* bit-1 cells (boundary or covered) keep normal nearest-hit semantics and
  fall through to the integrator's exact bounded re-trace — masking only
  removes work, never changes the image.

Opaque triangles (and any material the integrator's alpha path ignores:
no ALPHA_TEST flag, no base texture) get the all-ones mask, so the kernel
needs no per-record "is alpha" flag.
"""

from __future__ import annotations

import numpy as np

GRID = 6                 # cells per barycentric axis
CELLS = 21               # triangular cells with i + j <= GRID - 1
MASK_FULL = (1 << CELLS) - 1
# aux lane encoding (pack_tris with masks): bit 0 = double-sided,
# bits [1, 22) = mask.  22 bits < 2^24, exact in a float32 lane.
AUX_BITS = 1 + CELLS

# --- fine two-plane masks (multi-hit kernel) -------------------------------
# A PARALLEL int32 row table (pallas_traverse.pack_fine_mask_rows) gives
# each triangle record 10 full int32 lanes: words 0-4 are the PASS plane
# (bit 0 only when every bilinear alpha sample in the cell is < cutoff —
# same conservative contract as the coarse aux mask, 7.3x the cells), and
# words 5-9 the OPAQUE plane (bit 1 only when every bilinear sample is
# >= cutoff, i.e. the integrator's exact test provably KEEPS the hit).
# An opaque-plane hit therefore bounds t like an ordinary opaque surface:
# the multi-hit kernel prunes traversal against min(slot K-1, nearest
# opaque hit), restoring single-hit-strength pruning on solid leaf
# interiors and on opaque materials (whose planes are all-ones).
FINE_GRID = 17
FINE_CELLS = 153         # 17 * 18 / 2 <= 160 = 5 * 32 bits
FINE_WORDS = 5           # int32 words per plane
FINE_STRIDE = 2 * FINE_WORDS  # record stride in the mask row (lanes)


def cell_index(ci, cj):
    """Triangular packing of in-domain cells: row j holds GRID - j cells.
    Works for numpy and jnp integer arrays (and Pallas traced scalars)."""
    return cj * GRID + ci - ((cj * (cj - 1)) >> 1)


def fine_cell(u, v, grid: int = FINE_GRID):
    """(cell index, in-domain) for the fine triangular grid; jnp-traceable
    (shared by the Pallas kernel, the parity oracle, and tests)."""
    import jax.numpy as jnp

    ci = jnp.clip((u * grid).astype(jnp.int32), 0, grid - 1)
    cj = jnp.clip((v * grid).astype(jnp.int32), 0, grid - 1)
    cell = cj * grid + ci - ((cj * (cj - 1)) >> 1)
    return cell, (ci + cj) <= grid - 1


def fine_mask_test(words, u, v):
    """Two-plane fine test: (keep, opaque) from (..., FINE_STRIDE) int32
    words (PASS plane words [0, FINE_WORDS), OPAQUE plane words
    [FINE_WORDS, FINE_STRIDE)).  Out-of-domain cells (u + v == 1 edge via
    fp rounding) keep and are never opaque."""
    import jax.numpy as jnp

    cell, in_dom = fine_cell(u, v)
    word = cell >> 5
    bit = cell & 31
    p = jnp.zeros_like(cell)
    o = jnp.zeros_like(cell)
    for wd in range(FINE_WORDS):
        p = jnp.where(word == wd, words[..., wd], p)
        o = jnp.where(word == wd, words[..., wd + FINE_WORDS], o)
    keep = (((p >> bit) & 1) == 1) | ~in_dom
    opaque = (((o >> bit) & 1) == 1) & in_dom
    return keep, opaque


def mask_test(mask_int, u, v):
    """The kernel/oracle-shared coverage test: True = keep the hit.

    `mask_int` is an int32 mask (bits [0, CELLS)), `u`/`v` barycentrics of
    a candidate hit (u >= 0, v >= 0, u + v <= 1 up to fp error).  Cells
    outside the triangular domain (only reachable on the u + v == 1 edge
    through fp rounding) always pass — the integrator's exact test covers
    them.  Pure jnp so the same code runs inside the Pallas kernel, the
    vmapped CPU oracle, and tests."""
    import jax.numpy as jnp

    ci = jnp.clip((u * GRID).astype(jnp.int32), 0, GRID - 1)
    cj = jnp.clip((v * GRID).astype(jnp.int32), 0, GRID - 1)
    bit = (mask_int >> cell_index(ci, cj)) & 1
    return (bit == 1) | ((ci + cj) > (GRID - 1))


def _coverage_integral(texture: np.ndarray, threshold: float) -> np.ndarray:
    """(H+1, W+1) int64 integral image of (texel_alpha/255 >= threshold)."""
    covered = (texture[..., 3].astype(np.float32) * (1.0 / 255.0)
               >= threshold - 1e-6)
    ii = np.zeros((covered.shape[0] + 1, covered.shape[1] + 1), np.int64)
    ii[1:, 1:] = covered.cumsum(0).cumsum(1)
    return ii


def _rect_count(ii: np.ndarray, y0, y1, x0, x1):
    """Inclusive in-bounds rect count from an integral image; vectorized.
    Empty ranges (x0 > x1) contribute 0."""
    x0c = np.minimum(x0, x1 + 1)
    y0c = np.minimum(y0, y1 + 1)
    return (ii[y1 + 1, x1 + 1] - ii[y0c, x1 + 1]
            - ii[y1 + 1, x0c] + ii[y0c, x0c])


def _wrapped_ranges(lo, hi, n):
    """Split the repeat-wrapped inclusive texel range [lo, hi] into <= 2
    in-bounds ranges (a0, a1), (b0, b1); the second is empty (b0 > b1)
    when no wrap occurs.  Spans >= n cover the whole axis."""
    full = (hi - lo + 1) >= n
    lo_m = np.mod(lo, n)
    hi_m = np.mod(hi, n)
    wraps = lo_m > hi_m
    a0 = np.where(full, 0, lo_m)
    a1 = np.where(full | wraps, n - 1, hi_m)
    b0 = np.where(~full & wraps, 0, 1)
    b1 = np.where(~full & wraps, hi_m, 0)
    return a0, a1, b0, b1


def _cell_counts(uv: np.ndarray, ii: np.ndarray, w: int, h: int,
                 grid: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-cell >=cutoff texel counts + footprint areas for one batch.

    uv: (B, 3, 2) per-vertex texture coordinates.  Returns (count, area),
    each (B, cells) int64, over the triangular cells of `grid` in
    cell_index order.  The footprint is the cell square's affine image,
    repeat-wrapped, dilated by the bilinear support + 1 texel of fp slack
    (strictly conservative for BOTH planes: `count > 0` over-approximates
    "any sample >= cutoff", `count == area` under-approximates "every
    sample >= cutoff")."""
    q0 = uv[:, 0]                       # (B, 2)
    e1 = uv[:, 1] - uv[:, 0]
    e2 = uv[:, 2] - uv[:, 0]

    # In-domain cells (i, j), i + j <= grid-1, triangular order.
    js, is_ = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    keep = (is_ + js) <= grid - 1
    ci = is_[keep].astype(np.float32)    # (cells,)
    cj = js[keep].astype(np.float32)
    inv = 1.0 / grid

    # Affine image of the cell square: per-axis extrema from the sign
    # of the edge contributions (no (B, cells, 4, 2) corner tensor).
    def axis_bounds(axis):
        base = (q0[:, axis, None]
                + ci[None, :] * inv * e1[:, axis, None]
                + cj[None, :] * inv * e2[:, axis, None])
        lo = (base + np.minimum(e1[:, axis, None], 0.0) * inv
              + np.minimum(e2[:, axis, None], 0.0) * inv)
        hi = (base + np.maximum(e1[:, axis, None], 0.0) * inv
              + np.maximum(e2[:, axis, None], 0.0) * inv)
        return lo, hi

    ulo, uhi = axis_bounds(0)
    vlo, vhi = axis_bounds(1)
    # Bilinear footprint of uv: texels floor(u*w - 0.5) and +1; dilate
    # one extra texel for fp slack (cheap, strictly conservative).
    x_lo = np.floor(ulo * w - 0.5).astype(np.int64) - 1
    x_hi = np.floor(uhi * w - 0.5).astype(np.int64) + 2
    y_lo = np.floor(vlo * h - 0.5).astype(np.int64) - 1
    y_hi = np.floor(vhi * h - 0.5).astype(np.int64) + 2

    xa0, xa1, xb0, xb1 = _wrapped_ranges(x_lo, x_hi, w)
    ya0, ya1, yb0, yb1 = _wrapped_ranges(y_lo, y_hi, h)
    count = (_rect_count(ii, ya0, ya1, xa0, xa1)
             + _rect_count(ii, ya0, ya1, xb0, xb1)
             + _rect_count(ii, yb0, yb1, xa0, xa1)
             + _rect_count(ii, yb0, yb1, xb0, xb1))
    area = (np.minimum(x_hi - x_lo + 1, w)
            * np.minimum(y_hi - y_lo + 1, h))
    return count, area


_BATCH = 262144  # triangle batch bound for (B, cells) temporaries


def _cell_bits(uv: np.ndarray, ii: np.ndarray, w: int, h: int) -> np.ndarray:
    """(T,) uint32 coarse masks for triangles sharing one coverage
    integral image: bit c set when the cell's footprint contains any
    >=cutoff texel."""
    t = uv.shape[0]
    masks = np.zeros(t, np.uint32)
    for s in range(0, t, _BATCH):
        e = min(s + _BATCH, t)
        count, _ = _cell_counts(uv[s:e], ii, w, h, GRID)
        bits = (count > 0).astype(np.uint32)          # (B, CELLS)
        masks[s:e] = (bits << np.arange(CELLS, dtype=np.uint32)[None, :]
                      ).sum(axis=1, dtype=np.uint32)
    return masks


def _pack_plane(bits: np.ndarray, words: int) -> np.ndarray:
    """(B, cells) 0/1 -> (B, words) int32 little-endian bit packing."""
    b, cells = bits.shape
    padded = np.zeros((b, words * 32), np.uint32)
    padded[:, :cells] = bits
    shifts = np.arange(32, dtype=np.uint32)[None, None, :]
    return (padded.reshape(b, words, 32) << shifts).sum(
        axis=2, dtype=np.uint32).astype(np.int32)


def _fine_planes(uv: np.ndarray, ii: np.ndarray, w: int,
                 h: int) -> np.ndarray:
    """(T, FINE_STRIDE) int32 two-plane fine masks (see module header)."""
    t = uv.shape[0]
    out = np.zeros((t, FINE_STRIDE), np.int32)
    for s in range(0, t, _BATCH):
        e = min(s + _BATCH, t)
        count, area = _cell_counts(uv[s:e], ii, w, h, FINE_GRID)
        out[s:e, :FINE_WORDS] = _pack_plane(
            (count > 0).astype(np.uint32), FINE_WORDS)
        out[s:e, FINE_WORDS:] = _pack_plane(
            (count >= area).astype(np.uint32), FINE_WORDS)
    return out


def compute_fine_masks(tri_uv, tri_mat, mat_base_color, mat_params,
                       mat_tex, mat_flags, textures) -> np.ndarray:
    """(T, FINE_STRIDE) int32 two-plane fine masks (module header), same
    material semantics as compute_alpha_masks.  Non-participating
    triangles (opaque materials, alpha materials the integrator's exact
    test ignores) get PASS = OPAQUE = all-ones: their hits are final and
    bound traversal like any opaque surface."""
    from steeljax.scene.material import MaterialFlags

    tri_mat = np.asarray(tri_mat, np.int64)
    t = tri_mat.shape[0]
    out = np.full((t, FINE_STRIDE), -1, np.int32)
    if t == 0 or not textures:
        return out
    tri_uv = np.asarray(tri_uv, np.float32)
    mat_flags = np.asarray(mat_flags, np.int64)
    mat_tex = np.asarray(mat_tex, np.int64)
    params = np.asarray(mat_params, np.float32)
    base = np.asarray(mat_base_color, np.float32)

    ii_cache: dict[tuple[int, float], np.ndarray] = {}
    for m in range(len(mat_flags)):
        if not (mat_flags[m] & int(MaterialFlags.ALPHA_TEST)):
            continue
        tex_id = int(mat_tex[m, 0])
        if tex_id < 0:
            continue
        cutoff = float(params[m, 4])
        factor = float(base[m, 3])
        sel = np.nonzero(tri_mat == m)[0]
        if not len(sel):
            continue
        if cutoff <= 0.0:
            continue  # nothing is ever rejected: keep all-ones
        if factor <= 0.0 or cutoff / factor > 1.0 + 1e-6:
            out[sel] = 0  # fully transparent: reject everywhere
            continue
        thr = cutoff / factor
        key = (tex_id, round(thr, 6))
        if key not in ii_cache:
            ii_cache[key] = _coverage_integral(
                np.asarray(textures[tex_id]), thr)
        tex = np.asarray(textures[tex_id])
        h, w = tex.shape[:2]
        out[sel] = _fine_planes(tri_uv[sel], ii_cache[key], w, h)
    return out


def compute_alpha_masks(tri_uv, tri_mat, mat_base_color, mat_params,
                        mat_tex, mat_flags, textures) -> np.ndarray:
    """(T,) uint32 conservative coverage masks from UNPERMUTED per-triangle
    arrays + raw (H, W, 4) uint8 textures (Scene.textures order).

    Mirrors the integrator's alpha semantics (_alpha_rejected,
    AnyHit.rahit:35-52): only materials with the ALPHA_TEST flag AND a
    base-color texture participate (matching scene.flatten's
    any_alpha_test gate); alpha = base_alpha_factor * texel_alpha vs the
    material cutoff.  Everything else gets MASK_FULL."""
    from steeljax.scene.material import MaterialFlags

    tri_mat = np.asarray(tri_mat, np.int64)
    t = tri_mat.shape[0]
    masks = np.full(t, MASK_FULL, np.uint32)
    if t == 0 or not textures:
        return masks
    tri_uv = np.asarray(tri_uv, np.float32)
    mat_flags = np.asarray(mat_flags, np.int64)
    mat_tex = np.asarray(mat_tex, np.int64)
    params = np.asarray(mat_params, np.float32)
    base = np.asarray(mat_base_color, np.float32)

    ii_cache: dict[tuple[int, float], np.ndarray] = {}
    for m in range(len(mat_flags)):
        if not (mat_flags[m] & int(MaterialFlags.ALPHA_TEST)):
            continue
        tex_id = int(mat_tex[m, 0])
        if tex_id < 0:
            continue  # the integrator's alpha path ignores these too
        cutoff = float(params[m, 4])
        factor = float(base[m, 3])
        sel = np.nonzero(tri_mat == m)[0]
        if not len(sel):
            continue
        if cutoff <= 0.0:
            continue  # nothing is ever rejected: keep MASK_FULL
        if factor <= 0.0:
            masks[sel] = 0  # alpha = 0 everywhere: fully transparent
            continue
        thr = cutoff / factor
        if thr > 1.0 + 1e-6:
            masks[sel] = 0  # no texel can reach the cutoff
            continue
        key = (tex_id, round(thr, 6))
        if key not in ii_cache:
            ii_cache[key] = _coverage_integral(
                np.asarray(textures[tex_id]), thr)
        tex = np.asarray(textures[tex_id])
        h, w = tex.shape[:2]
        masks[sel] = _cell_bits(tri_uv[sel], ii_cache[key], w, h)
    return masks
