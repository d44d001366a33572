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
    d = direction
    ax = jnp.abs(d[..., 0])
    ay = jnp.abs(d[..., 1])
    az = jnp.abs(d[..., 2])

    # Face selection by dominant axis (ties break toward x, then y).
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(d[..., 0] >= 0, 0, 1),
        jnp.where(is_y, jnp.where(d[..., 1] >= 0, 2, 3),
                  jnp.where(d[..., 2] >= 0, 4, 5))).astype(jnp.int32)

    n = jnp.asarray(CUBE_FACES_N)[face]
    t = jnp.asarray(CUBE_FACES_T)[face]
    b = jnp.asarray(CUBE_FACES_B)[face]

    denom = jnp.sum(d * n, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    x = jnp.sum(d * t, axis=-1) / denom
    y = jnp.sum(d * b, axis=-1) / denom

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


def pack_mips(mips):
    """Pack a cube mip chain into one flat texel pool so trilinear lod
    sampling is 8 gathers from a single array (instead of evaluating every
    level).  Returns (data (N, 3), offsets (M,), resolutions (M,))."""
    offsets, sizes, chunks = [], [], []
    total = 0
    for cube in mips:
        r = cube.shape[1]
        offsets.append(total)
        sizes.append(r)
        chunks.append(cube.reshape(-1, 3))
        total += 6 * r * r
    return (jnp.concatenate(chunks, axis=0),
            jnp.asarray(np.array(offsets, np.int32)),
            jnp.asarray(np.array(sizes, np.int32)))


def _sample_flat_level(data, offsets, sizes, level, face, x, y):
    """Bilinear fetch at integer mip `level` given face + in-face unit
    coords x, y in [-1, 1]."""
    res = sizes[level]
    off = offsets[level]
    resf = res.astype(jnp.float32)
    u = (x + 1.0) * 0.5 * resf - 0.5
    v = (y + 1.0) * 0.5 * resf - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]

    def cl(i):
        return jnp.clip(i.astype(jnp.int32), 0, res - 1)

    def fetch(ui, vi):
        return data[off + (face * res + vi) * res + ui]

    c00 = fetch(cl(u0), cl(v0))
    c10 = fetch(cl(u0 + 1), cl(v0))
    c01 = fetch(cl(u0), cl(v0 + 1))
    c11 = fetch(cl(u0 + 1), cl(v0 + 1))
    top = c00 * (1 - fu) + c10 * fu
    bot = c01 * (1 - fu) + c11 * fu
    return top * (1 - fv) + bot * fv


def sample_flat_mips(data, offsets, sizes, direction, lod):
    """Trilinear samplerCube lookup over a packed mip chain."""
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
    n = jnp.asarray(CUBE_FACES_N)[face]
    t = jnp.asarray(CUBE_FACES_T)[face]
    b = jnp.asarray(CUBE_FACES_B)[face]
    denom = jnp.sum(d * n, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    x = jnp.sum(d * t, axis=-1) / denom
    y = jnp.sum(d * b, axis=-1) / denom

    count = sizes.shape[0]
    lod = jnp.clip(lod, 0.0, count - 1)
    lo = jnp.floor(lod).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, count - 1)
    frac = (lod - lo.astype(jnp.float32))[..., None]
    a = _sample_flat_level(data, offsets, sizes, lo, face, x, y)
    c = _sample_flat_level(data, offsets, sizes, hi, face, x, y)
    return a * (1 - frac) + c * frac
