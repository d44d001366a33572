"""Cubemap construction and sampling.

Face basis tables match Source/Shaders/Common/Constants.glsl:24-48 (order
+X -X +Y -Y +Z -Z), and texel directions match
`GetCubeDirection` (Compute/Compute.glsl:18-27): dir = normalize(N + x*T +
y*B) with (x, y) = uv*2-1 at texel centers.  Sampling inverts that mapping,
so round-tripping GenerateCubeImage -> sample is exact at texel centers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from steeljax.core.constants import CUBE_FACES_B, CUBE_FACES_N, CUBE_FACES_T


def face_directions(resolution: int) -> np.ndarray:
    """(6, R, R, 3) unit directions at texel centers (host-side)."""
    texel = (np.arange(resolution, dtype=np.float32) + 0.5) / resolution
    x, y = np.meshgrid(texel * 2.0 - 1.0, texel * 2.0 - 1.0, indexing="xy")
    dirs = (CUBE_FACES_N[:, None, None, :]
            + x[None, :, :, None] * CUBE_FACES_T[:, None, None, :]
            + y[None, :, :, None] * CUBE_FACES_B[:, None, None, :])
    # y index is the row (v), x the column (u): meshgrid 'xy' gives [row, col].
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs.astype(np.float32)


def sample_cube(cube: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """Bilinear samplerCube lookup.

    cube: (6, R, R, 3) float32; direction: (..., 3) (need not be
    normalized).  Returns (..., 3).
    """
    res = cube.shape[1]
    face, x, y = _cube_face_uv(direction)

    u = (x + 1.0) * 0.5 * res - 0.5
    v = (y + 1.0) * 0.5 * res - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    def clampi(i):
        return jnp.clip(i.astype(jnp.int32), 0, res - 1)

    u0i, u1i = clampi(u0), clampi(u0 + 1)
    v0i, v1i = clampi(v0), clampi(v0 + 1)

    def fetch(ui, vi):
        return cube[face, vi, ui]

    c00 = fetch(u0i, v0i)
    c10 = fetch(u1i, v0i)
    c01 = fetch(u0i, v1i)
    c11 = fetch(u1i, v1i)
    top = c00 * (1 - fu) + c10 * fu
    bot = c01 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv


def pack_cube_quads(cube: np.ndarray) -> np.ndarray:
    """Pack a (6, R, R, 3) cube into bilinear-footprint rows (6*R*R, 16):
    row (f*R + v)*R + u = [c(u,v), c(u+1,v), c(u,v+1), c(u+1,v+1), pad*4]
    with edge-clamped neighbors.  One TPU row gather then covers the whole
    2x2 bilinear footprint — per-texel gathers are ~10x slower on TPU."""
    cube = np.asarray(cube, np.float32)
    faces, res = cube.shape[0], cube.shape[1]
    right = cube[:, :, np.minimum(np.arange(res) + 1, res - 1)]
    down = cube[:, np.minimum(np.arange(res) + 1, res - 1)]
    down_right = down[:, :, np.minimum(np.arange(res) + 1, res - 1)]
    quads = np.zeros((faces, res, res, 16), np.float32)
    quads[..., 0:3] = cube
    quads[..., 3:6] = right
    quads[..., 6:9] = down
    quads[..., 9:12] = down_right
    return quads.reshape(faces * res * res, 16)


def _select_rows(table, index):
    """table[index] for a tiny static (F, 3) table as a fused select
    chain.  On TPU even a 6-row gather costs ~10 ms per 2M lookups (the
    cost is per *index*); 6 broadcast selects are fused elementwise and
    effectively free — this one change was ~40 ms of the 1080p hybrid
    frame (two _cube_face_uv calls x three basis gathers)."""
    table = np.asarray(table, np.float32)
    out = jnp.broadcast_to(jnp.asarray(table[0]), index.shape + (3,))
    for f in range(1, table.shape[0]):
        out = jnp.where((index == f)[..., None], jnp.asarray(table[f]), out)
    return out


def _cube_face_uv(direction):
    """Shared face-selection + in-face coordinate math; returns
    (face int32, x, y) with x/y in [-1, 1]."""
    d = direction
    ax = jnp.abs(d[..., 0])
    ay = jnp.abs(d[..., 1])
    az = jnp.abs(d[..., 2])
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(d[..., 0] >= 0, 0, 1),
        jnp.where(is_y, jnp.where(d[..., 1] >= 0, 2, 3),
                  jnp.where(d[..., 2] >= 0, 4, 5))).astype(jnp.int32)
    n = _select_rows(CUBE_FACES_N, face)
    t = _select_rows(CUBE_FACES_T, face)
    b = _select_rows(CUBE_FACES_B, face)
    denom = jnp.sum(d * n, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    x = jnp.sum(d * t, axis=-1) / denom
    y = jnp.sum(d * b, axis=-1) / denom
    return face, x, y


def sample_cube_quads(quads: jnp.ndarray, direction: jnp.ndarray
                      ) -> jnp.ndarray:
    """Bilinear samplerCube lookup over a pack_cube_quads table.  Matches
    sample_cube exactly (same clamp-to-edge semantics)."""
    res = int(round((quads.shape[0] // 6) ** 0.5))
    face, x, y = _cube_face_uv(direction)
    u = (x + 1.0) * 0.5 * res - 0.5
    v = (y + 1.0) * 0.5 * res - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    # Clamp-to-edge parity with sample_cube: below-range quads collapse to
    # the edge texel by zeroing the fraction (the precomputed quad already
    # clamps the +1 neighbors at the far edge).
    fu = jnp.where(u0 < 0, 0.0, u - u0)[..., None]
    fv = jnp.where(v0 < 0, 0.0, v - v0)[..., None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, res - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, res - 1)
    row = quads[(face * res + v0i) * res + u0i]      # (..., 16)
    top = row[..., 0:3] * (1 - fu) + row[..., 3:6] * fu
    bot = row[..., 6:9] * (1 - fu) + row[..., 9:12] * fu
    return top * (1 - fv) + bot * fv


def pack_mips(mips):
    """Pack a cube mip chain into one flat QUAD-row pool so trilinear lod
    sampling is TWO row gathers (one per bracketing level) instead of
    eight per-texel gathers — per-texel gathers cost ~10x on TPU.
    Returns (data (N, 16) quad rows, offsets (M,), resolutions (M,))."""
    offsets, sizes, chunks = [], [], []
    total = 0
    for cube in mips:
        r = cube.shape[1]
        offsets.append(total)
        sizes.append(r)
        chunks.append(pack_cube_quads(np.asarray(cube, np.float32)))
        total += 6 * r * r
    return (jnp.asarray(np.concatenate(chunks, axis=0)),
            jnp.asarray(np.array(offsets, np.int32)),
            jnp.asarray(np.array(sizes, np.int32)))


def _select_elems(vec, index):
    """vec[index] for a tiny (M,) array and per-pixel int index, as a
    select chain over static slices (see _select_rows: per-index gathers
    from tiny tables are ~10 ms per 2M lookups on TPU)."""
    out = jnp.broadcast_to(vec[0], index.shape)
    for m in range(1, vec.shape[0]):
        out = jnp.where(index == m, vec[m], out)
    return out


def _sample_flat_level(data, offsets, sizes, level, face, x, y):
    """Bilinear fetch at integer mip `level` given face + in-face unit
    coords x, y in [-1, 1] — one quad-row gather + lerp."""
    res = _select_elems(sizes, level)
    off = _select_elems(offsets, level)
    resf = res.astype(jnp.float32)
    u = (x + 1.0) * 0.5 * resf - 0.5
    v = (y + 1.0) * 0.5 * resf - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = jnp.where(u0 < 0, 0.0, u - u0)[..., None]
    fv = jnp.where(v0 < 0, 0.0, v - v0)[..., None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, res - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, res - 1)
    row = data[off + (face * res + v0i) * res + u0i]   # (..., 16)
    top = row[..., 0:3] * (1 - fu) + row[..., 3:6] * fu
    bot = row[..., 6:9] * (1 - fu) + row[..., 9:12] * fu
    return top * (1 - fv) + bot * fv


def sample_flat_mips(data, offsets, sizes, direction, lod):
    """Trilinear samplerCube lookup over a packed mip chain."""
    face, x, y = _cube_face_uv(direction)

    count = sizes.shape[0]
    lod = jnp.clip(lod, 0.0, count - 1)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, count - 1)
    frac = (lod - lo.astype(jnp.float32))[..., None]
    a = _sample_flat_level(data, offsets, sizes, lo, face, x, y)
    c = _sample_flat_level(data, offsets, sizes, hi, face, x, y)
    return a * (1 - frac) + c * frac


# ---------------------------------------------------------------------------
# One-gather trilinear: mip-PAIR packed rows.
#
# sample_flat_mips costs TWO row gathers per lookup (one per bracketing
# mip), and on TPU gather cost is per *index*, not per row width (see the
# data-movement rules) — so packing the coarse mip's candidate texels into
# the fine row halves the gather count exactly.  Row layout (48 f32):
#   [0:12]  fine 2x2 bilinear quad (pack_cube_quads order)
#   [12:39] coarse 3x3 block at base = ((fine_texel - 1) >> 1) per axis,
#           edge-clamped — 3x3 because the coarse quad start is one of
#           two texels depending on the sub-texel fraction
#   [39:48] pad
# The coarse 2x2 quad inside the 3x3 block starts at rel in {0, 1} per
# axis (rel = coarse_texel - base), selected at runtime with two selects
# per axis — the math below reproduces sample_flat_mips bit-for-bit.
# ---------------------------------------------------------------------------

def pack_mips_tri(mips):
    """Pack a cube mip chain into mip-pair rows for one-gather trilinear.
    Returns (data (N, 48), offsets (M,), resolutions (M,)) keyed exactly
    like pack_mips (level = FINE level of the pair; the last level pairs
    with itself and its coarse half carries zero trilinear weight)."""
    offsets, sizes, chunks = [], [], []
    total = 0
    count = len(mips)
    for m in range(count):
        fine = np.asarray(mips[m], np.float32)
        coarse = np.asarray(mips[min(m + 1, count - 1)], np.float32)
        rf = fine.shape[1]
        rc = coarse.shape[1]
        rows = np.zeros((6, rf, rf, 48), np.float32)
        rows[..., 0:12] = pack_cube_quads(fine).reshape(6, rf, rf, 16)[
            ..., 0:12]
        base = ((np.arange(rf) - 1) >> 1)
        for j in range(3):          # coarse v offset
            iv = np.clip(base + j, 0, rc - 1)
            for i in range(3):      # coarse u offset
                iu = np.clip(base + i, 0, rc - 1)
                sl = 12 + (j * 3 + i) * 3
                rows[..., sl:sl + 3] = coarse[:, iv[:, None], iu[None, :]]
        offsets.append(total)
        sizes.append(rf)
        chunks.append(rows.reshape(6 * rf * rf, 48))
        total += 6 * rf * rf
    return (jnp.asarray(np.concatenate(chunks, axis=0)),
            jnp.asarray(np.array(offsets, np.int32)),
            jnp.asarray(np.array(sizes, np.int32)))


def sample_flat_mips_tri(data, offsets, sizes, direction, lod):
    """Trilinear samplerCube lookup over a pack_mips_tri pool — ONE row
    gather per lookup; matches sample_flat_mips exactly."""
    face, x, y = _cube_face_uv(direction)

    count = sizes.shape[0]
    lod = jnp.clip(lod, 0.0, count - 1)
    lo = jnp.floor(lod).astype(jnp.int32)
    frac = (lod - lo.astype(jnp.float32))[..., None]

    res = _select_elems(sizes, lo)
    off = _select_elems(offsets, lo)
    resf = res.astype(jnp.float32)
    u = (x + 1.0) * 0.5 * resf - 0.5
    v = (y + 1.0) * 0.5 * resf - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = jnp.where(u0 < 0, 0.0, u - u0)[..., None]
    fv = jnp.where(v0 < 0, 0.0, v - v0)[..., None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, res - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, res - 1)
    row = data[off + (face * res + v0i) * res + u0i]     # (..., 48)

    top = row[..., 0:3] * (1 - fu) + row[..., 3:6] * fu
    bot = row[..., 6:9] * (1 - fu) + row[..., 9:12] * fu
    fine = top * (1 - fv) + bot * fv

    hi = jnp.minimum(lo + 1, count - 1)
    res_c = _select_elems(sizes, hi)
    rcf = res_c.astype(jnp.float32)
    uc = (x + 1.0) * 0.5 * rcf - 0.5
    vc = (y + 1.0) * 0.5 * rcf - 0.5
    uc0 = jnp.floor(uc)
    vc0 = jnp.floor(vc)
    fuc = jnp.where(uc0 < 0, 0.0, uc - uc0)[..., None]
    fvc = jnp.where(vc0 < 0, 0.0, vc - vc0)[..., None]
    uc0i = jnp.clip(uc0.astype(jnp.int32), 0, res_c - 1)
    vc0i = jnp.clip(vc0.astype(jnp.int32), 0, res_c - 1)
    # Position of the coarse quad inside the packed 3x3 block; {0, 1} by
    # construction when res_c == res/2, clipped for the weight-0
    # last-level self-pair where the relation does not hold.
    rel_u = jnp.clip(uc0i - ((u0i - 1) >> 1), 0, 1)
    rel_v = jnp.clip(vc0i - ((v0i - 1) >> 1), 0, 1)

    def bt(i, j):
        sl = 12 + (j * 3 + i) * 3
        return row[..., sl:sl + 3]

    pu = (rel_u == 1)[..., None]
    pv = (rel_v == 1)[..., None]

    def at(i):
        return (jnp.where(pv, jnp.where(pu, bt(i + 1, 1), bt(i, 1)),
                          jnp.where(pu, bt(i + 1, 0), bt(i, 0))),
                jnp.where(pv, jnp.where(pu, bt(i + 1, 2), bt(i, 2)),
                          jnp.where(pu, bt(i + 1, 1), bt(i, 1))))

    (c00, c01), (c10, c11) = at(0), at(1)
    topc = c00 * (1 - fuc) + c10 * fuc
    botc = c01 * (1 - fuc) + c11 * fuc
    coarse = topc * (1 - fvc) + botc * fvc
    return fine * (1 - frac) + coarse * frac
