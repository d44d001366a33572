"""Bindless-style texture sampling from the flat texel pool.

The reference binds `sampler2D materialTextures[1024]` with linear-repeat
samplers (TextureCache.cpp:11-34); ray-generation shaders sample implicit
lod 0 (no derivatives in RT stages), so bilinear lod-0 here is exact parity
for the path tracer.  Textures live in one flat (N, 4) uint8 pool with
per-texture offset/size descriptors (scene.flatten), so a sample is four
gathers + a lerp — TPU-friendly since all lanes share the pool.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_level(atlas, tex_offset, tex_size, tex_id, uv, level):
    """Bilinear repeat-wrap sample at integer mip `level` (broadcastable).

    atlas: (N, 4) uint8; tex_offset: (K, M) int32 per-mip offsets;
    tex_id: (...,) int32 (callers mask id < 0 themselves); uv: (..., 2).
    Returns (..., 4) float32 in [0, 1].
    """
    tid = jnp.maximum(tex_id, 0)
    level = jnp.clip(level, 0, tex_offset.shape[1] - 1)
    # Descriptor fetch: TPU gathers cost ~10 ms per 2M indices EVEN from a
    # tiny table, so for the typical small texture count the (K, .) rows
    # come from a fused select chain over static slices; big atlases keep
    # the row gather.
    k = tex_offset.shape[0]
    if k <= 32:
        size_row = jnp.broadcast_to(tex_size[0], tid.shape + (2,))
        off_row = jnp.broadcast_to(tex_offset[0],
                                   tid.shape + (tex_offset.shape[1],))
        for i in range(1, k):
            sel = (tid == i)[..., None]
            size_row = jnp.where(sel, tex_size[i], size_row)
            off_row = jnp.where(sel, tex_offset[i], off_row)
    else:
        size_row = tex_size[tid]                   # (..., 2)
        off_row = tex_offset[tid]                  # (..., M)
    w = jnp.maximum(size_row[..., 0] >> level, 1)
    h = jnp.maximum(size_row[..., 1] >> level, 1)
    if isinstance(level, int) or getattr(level, "ndim", 0) == 0:
        off = off_row[..., level]
    else:
        # Mip select over the small static mip axis (same reasoning).
        off = off_row[..., 0]
        for m in range(1, tex_offset.shape[1]):
            off = jnp.where(level == m, off_row[..., m], off)

    x = uv[..., 0] * w.astype(jnp.float32) - 0.5
    y = uv[..., 1] * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.mod(y0.astype(jnp.int32), h)

    # ONE quad-row gather covers the whole repeat-wrapped 2x2 footprint
    # (scene.flatten._pack_texture_quads) — 4 separate texel gathers cost
    # ~4x (per-index pricing on TPU).
    quad = atlas[off + y0i * w + x0i].astype(jnp.float32) * (1.0 / 255.0)
    top = quad[..., 0:4] * (1.0 - fx) + quad[..., 4:8] * fx
    bot = quad[..., 8:12] * (1.0 - fx) + quad[..., 12:16] * fx
    return top * (1.0 - fy) + bot * fy


def sample_bilinear(atlas, tex_offset, tex_size, tex_id, uv):
    """Bilinear sample at lod 0 (ray-tracing stages sample implicit lod 0
    — no derivatives in RT shaders, so this is PT-mode parity)."""
    return _bilinear_level(atlas, tex_offset, tex_size, tex_id, uv, 0)


def sample_trilinear(atlas, tex_offset, tex_size, tex_id, uv, lod):
    """Trilinear sample (the raster pipeline's mip-mapped texture()):
    bilinear at the two bracketing mips + linear blend."""
    lo = jnp.floor(jnp.maximum(lod, 0.0)).astype(jnp.int32)
    frac = (jnp.maximum(lod, 0.0) - lo.astype(jnp.float32))[..., None]
    a = _bilinear_level(atlas, tex_offset, tex_size, tex_id, uv, lo)
    b = _bilinear_level(atlas, tex_offset, tex_size, tex_id, uv, lo + 1)
    return a * (1.0 - frac) + b * frac
