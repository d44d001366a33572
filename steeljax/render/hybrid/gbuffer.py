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
"""

from __future__ import annotations

import jax.numpy as jnp

from steeljax.accel.dispatch import TraceTables, trace_nearest
from steeljax.render.pt import brdf as brdf_lib
from steeljax.render.pt.integrator import _interp, _normalize
from steeljax.render.texture import sample_trilinear
from steeljax.scene.flatten import FlatScene
from steeljax.scene.material import MaterialFlags


def _quantize(x, bits: int):
    levels = float((1 << bits) - 1)
    return jnp.round(jnp.clip(x, 0.0, 1.0) * levels) / levels


def _material_flag(scene: FlatScene, tri, flag: MaterialFlags):
    mat = scene.tri_mat[jnp.maximum(tri, 0)]
    return (scene.mat_flags[mat] & int(flag)) != 0


def trace_opaque(scene: FlatScene, tables: TraceTables, o, d, t_min, t_max,
                 max_retrace: int):
    """Nearest opaque hit: skips alpha-blend surfaces entirely and
    alpha-test texels below the cutoff (forward-stage geometry is invisible
    to the G-buffer)."""
    from steeljax.render.pt.integrator import _alpha_at

    rec = trace_nearest(tables, scene.tri_pos, scene.tri_double_sided, o, d,
                        t_min, t_max, cull_backface=True)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])

    def rejected_mask(rec):
        blend = _material_flag(scene, rec["tri"], MaterialFlags.ALPHA_BLEND)
        atest = _material_flag(scene, rec["tri"], MaterialFlags.ALPHA_TEST)
        cutoff = scene.mat_params[
            scene.tri_mat[jnp.maximum(rec["tri"], 0)], 4]
        cut = atest & (_alpha_at(scene, rec["tri"], rec["u"], rec["v"])
                       < cutoff)
        return rec["hit"] & (blend | cut)

    for _ in range(max_retrace):
        rejected = rejected_mask(rec)
        rec2 = trace_nearest(tables, scene.tri_pos, scene.tri_double_sided,
                             o, d, rec["t"] + 1e-4, tmax,
                             cull_backface=True)
        rec = {k: jnp.where(rejected, rec2[k], rec[k]) for k in rec}

    final_reject = rejected_mask(rec)
    rec["hit"] = rec["hit"] & ~final_reject
    rec["tri"] = jnp.where(rec["hit"], rec["tri"], -1)
    rec["t"] = jnp.where(rec["hit"], rec["t"], -1.0)
    return rec


def generate_gbuffer(scene: FlatScene, tables: TraceTables, o, d,
                     t_min, t_max, view_proj, camera_position,
                     max_retrace: int = 4, pixel_spread: float = 0.0):
    """Returns the G-buffer dict for a ray batch: normal (N,3 in [0,1]
    10-bit packed), emission (N,3 linear-raw), base_color_occlusion (N,4
    8-bit), rough_metal (N,2 8-bit), depth (N, reverse-z NDC, 0 = miss),
    hit (N,)."""
    rec = trace_opaque(scene, tables, o, d, t_min, t_max, max_retrace)
    tri = jnp.maximum(rec["tri"], 0)
    u, v = rec["u"], rec["v"]
    mat = scene.tri_mat[tri]
    hit = rec["hit"]

    p = o + d * rec["t"][..., None]
    uv = _interp(scene.tri_uv, tri, u, v)
    normal = _normalize(_interp(scene.tri_nrm, tri, u, v))
    tangent = _normalize(_interp(scene.tri_tan, tri, u, v))

    # Mip lod from the ray footprint (the raster pipeline's implicit
    # derivatives): world footprint ~ t * pixel spread / cos(incidence),
    # converted to texels with the per-triangle uv density.
    shade = scene.tri_shade[tri]
    geom_n = _normalize(shade[:, 24:27])
    cos_inc = jnp.maximum(jnp.abs(jnp.sum(geom_n * d, axis=-1)), 0.3)
    uv_density = shade[:, 27]
    footprint_uv = (rec["t"] * pixel_spread / cos_inc) * uv_density
    base_lod = jnp.log2(jnp.maximum(footprint_uv, 1e-20))

    # DOUBLE_SIDED: FaceForward toward the viewer (Material.glsl:33-38).
    view = _normalize(camera_position - p)
    ds_mat = (scene.mat_flags[mat] & int(MaterialFlags.DOUBLE_SIDED)) != 0
    flip = ds_mat & (jnp.sum(normal * view, axis=-1) < 0.0)
    normal = jnp.where(flip[..., None], -normal, normal)

    # NORMAL_MAPPING (Material.glsl:40-47).
    n_idx = scene.mat_tex[mat, 2]
    has_nm = n_idx >= 0
    nm_width = jnp.maximum(scene.tex_size[jnp.maximum(n_idx, 0), 0], 1)
    nm_lod = base_lod + jnp.log2(nm_width.astype(jnp.float32))
    ns = sample_trilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                          n_idx, uv, nm_lod)[..., :3] * 2.0 - 1.0
    scale = scene.mat_params[mat, 2]
    ns = _normalize(ns * jnp.stack([scale, scale, jnp.ones_like(scale)],
                                   axis=-1))
    tbn = brdf_lib.make_tbn_with_tangent(normal, tangent)
    mapped = _normalize(brdf_lib.tangent_to_world(ns, tbn))
    normal = jnp.where(has_nm[..., None], mapped, normal)

    def tex_sample(slot):
        idx = scene.mat_tex[mat, slot]
        width = jnp.maximum(scene.tex_size[jnp.maximum(idx, 0), 0], 1)
        lod = base_lod + jnp.log2(width.astype(jnp.float32))
        s = sample_trilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             idx, uv, lod)
        return s, idx >= 0

    base_tex, has_base = tex_sample(0)
    base_color = scene.mat_base_color[mat, :3] * jnp.where(
        has_base[..., None], base_tex[..., :3], 1.0)

    em_tex, has_em = tex_sample(4)
    emission = scene.mat_emission[mat] * jnp.where(
        has_em[..., None], em_tex[..., :3], 1.0)

    rm_tex, has_rm = tex_sample(1)
    roughness = scene.mat_params[mat, 0] * jnp.where(has_rm, rm_tex[..., 1],
                                                     1.0)
    metallic = scene.mat_params[mat, 1] * jnp.where(has_rm, rm_tex[..., 2],
                                                    1.0)

    occ_tex, has_occ = tex_sample(3)
    occlusion = scene.mat_params[mat, 3] * jnp.where(has_occ,
                                                     occ_tex[..., 0], 1.0)

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
