"""G-buffer generation: primary visibility + material fetch.

The reference rasterizes opaque geometry into five targets
(GBufferStage.hpp:14-20): A2B10G10R10 packed normals, B10G11R11 emission,
RGBA8 baseColor+occlusion, RG8 roughness+metallic, D32 reverse depth.  On
TPU, primary visibility comes from the same BVH as everything else (a ray
cast at pixel centers is exactly the visibility the rasterizer computes,
including per-material backface culling); material evaluation follows
Hybrid/Material.glsl.  Unorm targets are quantized to the reference's bit
depths so banding matches the raster pipeline.

Alpha-blend materials are skipped (they belong to the forward stage,
GBufferStage.cpp:147-157); alpha-test materials discard below the cutoff
like the fragment shader's ALPHA_TEST path.

All per-hit attributes and material constants come from ONE tri_shade row
gather (layout in scene.flatten.FlatScene) — on TPU each extra small
gather costs ~10 ms/Mray, so the material table is denormalized per
triangle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from steeljax.accel.dispatch import TraceTables, trace_nearest
from steeljax.core.constants import RAY_DEAD_T
from steeljax.render.pt import brdf as brdf_lib
from steeljax.render.pt.integrator import _normalize
from steeljax.render.texture import sample_bilinear, sample_trilinear
from steeljax.scene.flatten import FlatScene
from steeljax.scene.material import MaterialFlags


def _quantize(x, bits: int):
    levels = float((1 << bits) - 1)
    return jnp.round(jnp.clip(x, 0.0, 1.0) * levels) / levels


def _interp_cols(row, base: int, u, v, width: int = 3):
    """Barycentric interpolation of a per-vertex attribute stored as three
    consecutive `width`-column blocks of a tri_shade row."""
    w = (1.0 - u - v)[..., None]
    return (row[:, base:base + width] * w
            + row[:, base + width:base + 2 * width] * u[..., None]
            + row[:, base + 2 * width:base + 3 * width] * v[..., None])


def _opaque_rejected(scene: FlatScene, tables, rec):
    """hit & (alpha-blend | alpha-test-discard): surfaces invisible to the
    G-buffer (they belong to the forward stage)."""
    from steeljax.render.pt.integrator import shade_rows
    row = shade_rows(scene, tables, rec)
    flags = row[:, 40].astype(jnp.int32)
    blend = (flags & int(MaterialFlags.ALPHA_BLEND)) != 0
    atest = (flags & int(MaterialFlags.ALPHA_TEST)) != 0
    alpha = row[:, 35]
    if scene.has_textures:
        uv = _interp_cols(row, 18, rec["u"], rec["v"], width=2)
        tex = row[:, 41].astype(jnp.int32)
        sampled = sample_bilinear(scene.atlas, scene.tex_offset,
                                  scene.tex_size, tex, uv)[..., 3]
        alpha = alpha * jnp.where(tex >= 0, sampled, 1.0)
    return rec["hit"] & (blend | (atest & (alpha < row[:, 38])))


def trace_opaque(scene: FlatScene, tables: TraceTables, o, d, t_min, t_max,
                 max_retrace: int):
    """Nearest opaque hit: skips alpha-blend surfaces entirely and
    alpha-test texels below the cutoff.  Re-trace passes run only for
    rejected rays and are skipped outright (lax.cond) when nothing was
    rejected — opaque scenes pay one reduction, not max_retrace traces."""
    rec = trace_nearest(tables, scene.tri_pos, scene.tri_double_sided, o, d,
                        t_min, t_max, cull_backface=True,
                        shared_origin=True, coherent=True)
    if not (scene.any_alpha_blend or scene.any_alpha_test):
        return rec
    return _alpha_retrace(scene, tables, o, d, rec, t_max, max_retrace)


def raster_or_trace_opaque(scene: FlatScene, tables: TraceTables, o, d,
                           t_min, t_max, max_retrace: int, raster,
                           view_proj):
    """Rasterized primary visibility (render.hybrid.raster — the TPU
    analog of the reference's raster G-buffer pipeline,
    GBufferStage.cpp:147-157).

    `raster` = (RasterScene, width, height, tile).  The raster produces
    the same nearest-opaque rec as the traced path; its slice loops are
    data-dependent, so density never overflows a budget.  Alpha-BLEND
    triangles are excluded from the raster input; alpha-TEST discards
    resolve through the same bounded re-trace as the traced path."""
    from steeljax.render.hybrid.raster import raster_rec

    rscene, width, height, tile = raster
    rrec = raster_rec(rscene, view_proj, width, height, tile, d, t_min)
    if not scene.any_alpha_test:
        return rrec
    return _alpha_retrace(scene, tables, o, d, rrec, t_max, max_retrace)


def _alpha_retrace(scene: FlatScene, tables: TraceTables, o, d, rec,
                   t_max, max_retrace: int):
    """Bounded alpha re-trace from an initial nearest-hit rec (shared by
    the traced and rasterized visibility paths)."""
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])

    def retrace_pass(rec):
        rejected = _opaque_rejected(scene, tables, rec)

        def do_retrace(rec):
            rec2 = trace_nearest(
                tables, scene.tri_pos, scene.tri_double_sided, o, d,
                rec["t"] + 1e-4, jnp.where(rejected, tmax, RAY_DEAD_T),
                cull_backface=True, shared_origin=True, coherent=True)
            return {k: jnp.where(rejected, rec2[k], rec[k]) for k in rec}

        return jax.lax.cond(jnp.any(rejected), do_retrace, lambda r: r, rec)

    for _ in range(max_retrace):
        rec = retrace_pass(rec)
    final_reject = _opaque_rejected(scene, tables, rec)
    rec["hit"] = rec["hit"] & ~final_reject
    rec["tri"] = jnp.where(rec["hit"], rec["tri"], -1)
    rec["t"] = jnp.where(rec["hit"], rec["t"], -1.0)
    return rec


def generate_gbuffer(scene: FlatScene, tables: TraceTables, o, d,
                     t_min, t_max, view_proj, camera_position,
                     max_retrace: int = 4, pixel_spread: float = 0.0,
                     raster=None):
    """Returns the G-buffer dict for a ray batch: normal (N,3 in [0,1]
    10-bit packed), emission (N,3 linear-raw), base_color_occlusion (N,4
    8-bit), rough_metal (N,2 8-bit), depth (N, reverse-z NDC, 0 = miss),
    hit (N,).

    `raster` = (RasterScene, width, height, tile) switches primary
    visibility to the rasterizer (render.hybrid.raster) with a traced
    fallback; None keeps the traced path."""
    if raster is not None:
        rec = raster_or_trace_opaque(scene, tables, o, d, t_min, t_max,
                                     max_retrace, raster, view_proj)
    else:
        rec = trace_opaque(scene, tables, o, d, t_min, t_max, max_retrace)
    tri = jnp.maximum(rec["tri"], 0)
    u, v = rec["u"], rec["v"]
    hit = rec["hit"]
    p = o + d * rec["t"][..., None]

    fused = "n" in rec  # fused trace+shade kernel outputs (accel.dispatch)
    if fused:
        from steeljax.render.pt.integrator import material_select
        mrow, _, tex_ids = material_select(scene, rec["mat"])
        # The kernel already interpolated/normalized the normal and
        # flipped it by winding; with backface culling on, visible
        # single-sided hits are always front-facing, so the flip fires
        # exactly for double-sided backfaces — the FaceForward of
        # Material.glsl:33-38 (geometric rather than shading-dot test).
        normal = rec["n"]
        tangent = rec.get("tan", jnp.zeros_like(normal))
        uv = rec.get("uv", jnp.zeros(normal.shape[:-1] + (2,), jnp.float32))
        uv_density = rec.get("uvd", jnp.zeros_like(rec["t"]))
        # Mip-footprint incidence from the SHADING normal: the fused
        # kernel does not export the geometric normal (it would cost a
        # 4th output column), so this path approximates the gather path's
        # geometric-normal cos_inc.  Divergence is bounded by the 0.3
        # floor and only moves texture LOD selection on smooth-shaded
        # silhouettes (documented parity deviation).
        cos_inc = jnp.maximum(
            jnp.abs(jnp.sum(normal * d, axis=-1)), 0.3)
        flags = mrow[:, 12].astype(jnp.int32)
        base_factor = mrow[:, 0:3]
        em_factor = mrow[:, 4:7]
        rough_factor = mrow[:, 7]
        metal_factor = mrow[:, 8]
        normal_scale = mrow[:, 9]
        occl_strength = mrow[:, 10]

        def slot_idx(slot):
            return tex_ids[:, slot]
    else:
        from steeljax.render.pt.integrator import shade_rows
        shade = shade_rows(scene, tables, rec)       # (N, 56)
        uv = _interp_cols(shade, 18, u, v, width=2)
        normal = _normalize(_interp_cols(shade, 0, u, v))
        tangent = _normalize(_interp_cols(shade, 9, u, v))
        geom_n = _normalize(shade[:, 24:27])
        cos_inc = jnp.maximum(jnp.abs(jnp.sum(geom_n * d, axis=-1)), 0.3)
        uv_density = shade[:, 27]
        flags = shade[:, 40].astype(jnp.int32)
        base_factor = shade[:, 46:49]
        em_factor = shade[:, 49:52]
        rough_factor = shade[:, 36]
        metal_factor = shade[:, 37]
        normal_scale = shade[:, 39]
        occl_strength = shade[:, 52]

        def slot_idx(slot):
            col = {0: 41, 1: 42, 2: 43, 3: 44, 4: 45}[slot]
            return shade[:, col].astype(jnp.int32)

        # DOUBLE_SIDED: FaceForward toward the viewer (Material.glsl:33-38).
        view = _normalize(camera_position - p)
        ds_mat = (flags & int(MaterialFlags.DOUBLE_SIDED)) != 0
        flip = ds_mat & (jnp.sum(normal * view, axis=-1) < 0.0)
        normal = jnp.where(flip[..., None], -normal, normal)

    # Mip lod from the ray footprint (the raster pipeline's implicit
    # derivatives): world footprint ~ t * pixel spread / cos(incidence),
    # converted to texels with the per-triangle uv density.
    footprint_uv = (rec["t"] * pixel_spread / cos_inc) * uv_density
    base_lod = jnp.log2(jnp.maximum(footprint_uv, 1e-20))

    def tex_width(idx):
        # Select chain over the small static texture axis (a tiny-table
        # gather costs ~10 ms per 2M pixels on TPU — see render.texture).
        tid = jnp.maximum(idx, 0)
        k = scene.tex_size.shape[0]
        if k > 32:
            return jnp.maximum(scene.tex_size[tid][..., 0], 1)
        w = jnp.broadcast_to(scene.tex_size[0, 0], tid.shape)
        for i in range(1, k):
            w = jnp.where(tid == i, scene.tex_size[i, 0], w)
        return jnp.maximum(w, 1)

    # NORMAL_MAPPING (Material.glsl:40-47) — statically skipped for
    # untextured scenes (the MaterialPipelineCache define analog): texture
    # gathers cost ~10 ms/Mray on TPU even against the dummy atlas.
    if scene.has_textures:
        n_idx = slot_idx(2)
        has_nm = n_idx >= 0
        nm_lod = base_lod + jnp.log2(tex_width(n_idx).astype(jnp.float32))
        ns = sample_trilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                              n_idx, uv, nm_lod)[..., :3] * 2.0 - 1.0
        scale = normal_scale
        ns = _normalize(ns * jnp.stack([scale, scale, jnp.ones_like(scale)],
                                       axis=-1))
        tbn = brdf_lib.make_tbn_with_tangent(normal, tangent)
        mapped = _normalize(brdf_lib.tangent_to_world(ns, tbn))
        normal = jnp.where(has_nm[..., None], mapped, normal)

    def tex_sample(slot):
        idx = slot_idx(slot)
        if not scene.has_textures:
            shape = idx.shape + (4,)
            return jnp.ones(shape, jnp.float32), idx >= 0
        lod = base_lod + jnp.log2(tex_width(idx).astype(jnp.float32))
        s = sample_trilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             idx, uv, lod)
        return s, idx >= 0

    base_tex, has_base = tex_sample(0)
    base_color = base_factor * jnp.where(
        has_base[..., None], base_tex[..., :3], 1.0)

    em_tex, has_em = tex_sample(4)
    emission = em_factor * jnp.where(
        has_em[..., None], em_tex[..., :3], 1.0)

    rm_tex, has_rm = tex_sample(1)
    roughness = rough_factor * jnp.where(has_rm, rm_tex[..., 1], 1.0)
    metallic = metal_factor * jnp.where(has_rm, rm_tex[..., 2], 1.0)

    occ_tex, has_occ = tex_sample(3)
    occlusion = occl_strength * jnp.where(has_occ, occ_tex[..., 0], 1.0)

    # Reverse-z NDC depth from the (already reverse-depth) projection.
    clip = jnp.einsum("ij,nj->ni", view_proj,
                      jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1))
    depth = clip[..., 2] / jnp.where(jnp.abs(clip[..., 3]) < 1e-20, 1e-20,
                                     clip[..., 3])

    z = jnp.zeros_like(depth)
    return {
        "normal": jnp.where(hit[..., None],
                            _quantize(normal * 0.5 + 0.5, 10), 0.0),
        "emission": jnp.where(hit[..., None], emission, 0.0),
        "base_color_occlusion": jnp.where(
            hit[..., None],
            _quantize(jnp.concatenate(
                [base_color, occlusion[..., None]], -1), 8), 0.0),
        "rough_metal": jnp.where(
            hit[..., None],
            _quantize(jnp.stack([roughness, metallic], -1), 8), 0.0),
        "depth": jnp.where(hit, depth, z),  # clear = 0 under reverse z
        "hit": hit,
    }
