"""Scene -> FlatScene: flat device arrays for rendering.

The reference re-builds its TLAS from the entity view every frame
(SceneRenderer.cpp:179-218); steeljax's equivalent "build" flattens all
renderable instances into world-space triangle arrays (SoA) on the host and
ships them to the device, where the LBVH (steeljax.accel) indexes them.
Descriptor sets (materials UBO, bindless texture array, per-primitive
SSBOs — PathTracing.layout:19-30) become a single pytree of arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from steeljax.core.constants import MAX_LIGHT_COUNT
from steeljax.scene.material import MaterialFlags
from steeljax.scene.scene import Scene


@struct.dataclass
class FlatScene:
    # Geometry (world space), one row per triangle.
    tri_pos: jnp.ndarray   # (T, 3, 3) float32
    tri_nrm: jnp.ndarray   # (T, 3, 3) float32 shading normals
    tri_tan: jnp.ndarray   # (T, 3, 3) float32 tangents
    tri_uv: jnp.ndarray    # (T, 3, 2) float32
    tri_mat: jnp.ndarray   # (T,) int32 material id
    tri_double_sided: jnp.ndarray  # (T,) bool — disables backface culling
    # (GetTlasInstance facing-cull-disable, SceneHelpers.cpp:166-192)

    # Materials (gpu::Material, Common.h:30-45).
    mat_base_color: jnp.ndarray  # (M, 4) float32
    mat_emission: jnp.ndarray    # (M, 3) float32
    mat_params: jnp.ndarray      # (M, 5) float32: rough, metal, normal_scale,
    #                                              occlusion, alpha_cutoff
    mat_tex: jnp.ndarray         # (M, 5) int32: base, roughMetal, normal,
    #                                            occlusion, emission (-1 none)
    mat_flags: jnp.ndarray       # (M,) int32 MaterialFlags bits

    # Bindless texture array -> one flat texel pool + per-texture
    # descriptors.  Each texture stores a full mip chain (TextureCache
    # generates mips on upload, TextureCache.cpp:74-115); tex_offset[k, m]
    # is the texel offset of texture k's mip m (repeating the last level).
    atlas: jnp.ndarray        # (N, 16) uint8 quad rows (all mips/textures)
    tex_offset: jnp.ndarray   # (K, MAX_TEX_MIPS) int32
    tex_size: jnp.ndarray     # (K, 2) int32 base (width, height)

    # Lights (gpu::Light, Common.h:24-28), padded to MAX_LIGHT_COUNT.
    light_location: jnp.ndarray  # (16, 4) float32, w = isPoint
    light_color: jnp.ndarray     # (16, 4) float32

    # Environment cubemap (+X -X +Y -Y +Z -Z), linear RGB.
    env_cube: jnp.ndarray  # (6, R, R, 3) float32

    # Gather-packed shading table: EVERYTHING unpack_material needs in ONE
    # row gather per hit.  TPU XLA row gathers run near memory bandwidth
    # (~4 ms for (1M, 48) on v5e) while each extra 1-d gather costs ~8 ms,
    # so material constants are denormalized per triangle (rebuilt on
    # reflatten, the analog of the reference's materials-dirty re-upload,
    # SceneRenderer.cpp:119-144).  Layout (48 cols):
    #   0:9    vertex normals       9:18  vertex tangents
    #   18:24  vertex uvs           24:27 geometric normal
    #   27     uv density (mip lod) 28    material id
    #   29:32  emission (linear)    32:35 base color factor (linear)
    #   35     base alpha factor    36    roughness factor
    #   37     metallic factor      38    alpha cutoff
    #   39     normal scale         40    material flags
    #   41:46  texture ids (base, roughMetal, normal, occlusion, emission)
    #   46:49  base color factor (raw, for ToLinear(factor*texel) parity)
    #   49:52  emission factor (raw)   52    occlusion strength
    tri_shade: jnp.ndarray   # (T, 56) float32
    # Legacy per-material rows for the hybrid/raster consumers:
    # mat_packed: [base rgba (4), emission (3), rough/metal/nscale/occl/
    # cutoff (7:12), flags (12), linear base rgb (13:16)].
    mat_packed: jnp.ndarray  # (M, 16) float32
    # Emission in linear space (ToLinear(factor) precomputed).
    mat_emission_linear: jnp.ndarray  # (M, 3) float32

    # Bilinear-footprint-packed environment cubemap: row (f*R+v)*R+u holds
    # the 2x2 texel quad [c(u,v), c(u+1,v), c(u,v+1), c(u+1,v+1)] with
    # edge-clamped neighbors, so a samplerCube lookup is ONE row gather
    # instead of four scalar-ish gathers (37 ms -> ~4 ms at 720p).
    env_quads: jnp.ndarray  # (6*R*R, 16) float32

    # Static (trace-time) metadata.
    light_count: int = struct.field(pytree_node=False, default=0)
    env_enabled: bool = struct.field(pytree_node=False, default=False)
    # The env cube was baked from the closed-form procedural sky: miss
    # shading evaluates env.sky.sky_radiance per ray (free elementwise)
    # instead of gathering env_quads (~10 ms per M rays on TPU).
    env_analytic: bool = struct.field(pytree_node=False, default=False)
    any_alpha_test: bool = struct.field(pytree_node=False, default=False)
    any_alpha_blend: bool = struct.field(pytree_node=False, default=False)
    has_textures: bool = struct.field(pytree_node=False, default=False)
    # True (pre-duplication) triangle count: after prepare_scene the
    # per-triangle arrays are a REFERENCE layout (SBVH spatial splits
    # duplicate straddling triangles), so len(tri_pos) overcounts.
    source_tri_count: int = struct.field(pytree_node=False, default=-1)

    @property
    def triangle_count(self) -> int:
        return self.tri_pos.shape[0]


MAX_TEX_MIPS = 13  # enough for 4096^2 sources


def _downsample2(img: np.ndarray) -> np.ndarray:
    """2x2 box filter with odd-size clamping (mip generation)."""
    h, w = img.shape[:2]
    nh, nw = max(h // 2, 1), max(w // 2, 1)
    ys = (np.arange(nh) * 2)
    xs = (np.arange(nw) * 2)
    y1 = np.minimum(ys + 1, h - 1)
    x1 = np.minimum(xs + 1, w - 1)
    acc = (img[np.ix_(ys, xs)].astype(np.uint16)
           + img[np.ix_(ys, x1)] + img[np.ix_(y1, xs)]
           + img[np.ix_(y1, x1)])
    return (acc // 4).astype(np.uint8)


def _normal_matrix(world: np.ndarray) -> np.ndarray:
    return np.linalg.inv(world[:3, :3]).T


def _pack_texture_quads(level: np.ndarray) -> np.ndarray:
    """(H, W, 4) uint8 -> (H*W, 16) rows of the repeat-wrapped 2x2
    bilinear footprint (see the atlas comment in flatten_scene)."""
    h, w = level.shape[:2]
    xr = (np.arange(w) + 1) % w
    yd = (np.arange(h) + 1) % h
    quad = np.concatenate([level, level[:, xr], level[yd],
                           level[yd][:, xr]], axis=-1)
    return quad.reshape(-1, 16)


def pack_tri_shade(tri_nrm, tri_tan, tri_uv, tri_pos, tri_mat=None,
                   mat_base_color=None, mat_emission=None, mat_params=None,
                   mat_tex=None, mat_flags=None) -> np.ndarray:
    """(T, 48) per-triangle shading row (layout in FlatScene docstring):
    vertex attributes plus the owning material's constants denormalized in,
    so a hit shades from a single row gather.  Material args may be omitted
    for geometry-only consumers (tests)."""
    t = len(tri_nrm)
    out = np.zeros((t, 56), np.float32)
    if t:
        out[:, 0:9] = np.asarray(tri_nrm, np.float32).reshape(t, 9)
        out[:, 9:18] = np.asarray(tri_tan, np.float32).reshape(t, 9)
        uv = np.asarray(tri_uv, np.float32)
        out[:, 18:24] = uv.reshape(t, 6)
        p = np.asarray(tri_pos, np.float32)
        gn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        out[:, 24:27] = gn
        world_area = 0.5 * np.linalg.norm(gn, axis=-1)
        duv1 = uv[:, 1] - uv[:, 0]
        duv2 = uv[:, 2] - uv[:, 0]
        uv_area = 0.5 * np.abs(duv1[:, 0] * duv2[:, 1]
                               - duv1[:, 1] * duv2[:, 0])
        out[:, 27] = np.sqrt(
            uv_area / np.maximum(world_area, 1e-20)).astype(np.float32)
        if tri_mat is not None:
            m = np.asarray(tri_mat, np.int64)
            out[:, 28] = m.astype(np.float32)
            out[:, 29:32] = _to_linear_np(np.asarray(mat_emission))[m]
            base = np.asarray(mat_base_color, np.float32)[m]
            out[:, 32:35] = _to_linear_np(base[:, :3])
            out[:, 35] = base[:, 3]
            params = np.asarray(mat_params, np.float32)[m]
            out[:, 36] = params[:, 0]   # roughness
            out[:, 37] = params[:, 1]   # metallic
            out[:, 38] = params[:, 4]   # alpha cutoff
            out[:, 39] = params[:, 2]   # normal scale
            out[:, 40] = np.asarray(mat_flags, np.float32)[m]
            out[:, 41:46] = np.asarray(mat_tex, np.float32)[m]
            out[:, 46:49] = base[:, :3]
            out[:, 49:52] = np.asarray(mat_emission, np.float32)[m]
            out[:, 52] = params[:, 3]   # occlusion strength
    return out


def _to_linear_np(srgb):
    srgb = np.asarray(srgb, np.float32)
    return np.where(srgb < 0.04045, srgb / 12.92,
                    ((srgb + 0.055) / 1.055) ** 2.4).astype(np.float32)


def pack_materials(mat_base_color, mat_emission, mat_params,
                   mat_flags) -> np.ndarray:
    """Columns: base rgba (0:4), emission (4:7), rough/metal/nscale/occl/
    cutoff (7:12), flags (12), linearized base rgb (13:16) — precomputed
    ToLinear(factor) so untextured scenes skip the sRGB pow entirely."""
    m = len(mat_base_color)
    out = np.zeros((m, 16), np.float32)
    out[:, 0:4] = mat_base_color
    out[:, 4:7] = mat_emission
    out[:, 7:12] = mat_params
    out[:, 12] = np.asarray(mat_flags, np.float32)
    out[:, 13:16] = _to_linear_np(mat_base_color[:, :3])
    return out


def refresh_lights(flat: FlatScene, scene: Scene) -> FlatScene:
    """Re-pack just the light rows from the entity view (the per-frame
    UpdateLightBuffer, SceneRenderer.cpp:77-118) — O(entities), used by the
    instanced refresh path where geometry tables stay resident."""
    locations, colors = scene.gather_lights()
    light_count = min(len(locations), MAX_LIGHT_COUNT)
    light_location = np.zeros((MAX_LIGHT_COUNT, 4), np.float32)
    light_color = np.zeros((MAX_LIGHT_COUNT, 4), np.float32)
    light_location[:light_count] = locations[:light_count]
    light_color[:light_count] = colors[:light_count]
    return flat.replace(light_location=jnp.asarray(light_location),
                        light_color=jnp.asarray(light_color),
                        light_count=int(light_count))


def _material_arrays(scene: Scene):
    """(base_color, emission, params, tex, flags) numpy tables from the
    scene's material list (gpu::Material re-pack, Common.h:30-45)."""
    mats = scene.materials or []
    m = max(len(mats), 1)
    mat_base_color = np.ones((m, 4), np.float32)
    mat_emission = np.zeros((m, 3), np.float32)
    mat_params = np.tile(np.array([1, 1, 1, 1, 0.5], np.float32), (m, 1))
    mat_tex = np.full((m, 5), -1, np.int32)
    mat_flags = np.zeros((m,), np.int32)
    for i, mat in enumerate(mats):
        mat_base_color[i] = mat.base_color_factor
        mat_emission[i] = mat.emission_factor[:3]
        mat_params[i] = [mat.roughness_factor, mat.metallic_factor,
                         mat.normal_scale, mat.occlusion_strength,
                         mat.alpha_cutoff]
        mat_tex[i] = [mat.base_color_texture,
                      mat.roughness_metallic_texture, mat.normal_texture,
                      mat.occlusion_texture, mat.emission_texture]
        mat_flags[i] = int(mat.flags)
    return mat_base_color, mat_emission, mat_params, mat_tex, mat_flags


def refresh_materials(flat: FlatScene, scene: Scene) -> FlatScene:
    """Re-pack just the material tables (the materials-dirty re-upload,
    SceneRenderer.cpp:119-144) — O(materials), used by the instanced
    refresh path (per-instance material rows rebuild inside
    InstancedAccel.prepare; these are the select-chain tables)."""
    mat_base_color, mat_emission, mat_params, mat_tex, mat_flags = \
        _material_arrays(scene)
    return flat.replace(
        mat_base_color=jnp.asarray(mat_base_color),
        mat_emission=jnp.asarray(mat_emission),
        mat_params=jnp.asarray(mat_params),
        mat_tex=jnp.asarray(mat_tex),
        mat_flags=jnp.asarray(mat_flags),
        mat_packed=jnp.asarray(pack_materials(
            mat_base_color, mat_emission, mat_params, mat_flags)),
        mat_emission_linear=jnp.asarray(_to_linear_np(mat_emission)))


def flatten_scene(scene: Scene, env_cube: np.ndarray | None = None,
                  env_analytic: bool = False) -> FlatScene:
    tri_pos, tri_nrm, tri_tan, tri_uv, tri_mat, tri_ds = [], [], [], [], [], []

    for entity_index in scene.renderable_entities():
        world = scene.world_transform(entity_index)
        nmat = _normal_matrix(world)
        for ro in scene.entities[entity_index].render_objects:
            prim = scene.primitives[ro.primitive]
            mat = scene.materials[ro.material]
            tri = prim.indices.reshape(-1, 3)

            pos = prim.positions @ world[:3, :3].T + world[:3, 3]
            nrm = prim.normals @ nmat.T
            nrm /= np.maximum(
                np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
            tan = prim.tangents @ world[:3, :3].T
            tan /= np.maximum(
                np.linalg.norm(tan, axis=-1, keepdims=True), 1e-20)

            tri_pos.append(pos[tri].astype(np.float32))
            tri_nrm.append(nrm[tri].astype(np.float32))
            tri_tan.append(tan[tri].astype(np.float32))
            tri_uv.append(prim.tex_coords[tri].astype(np.float32))
            tri_mat.append(np.full(len(tri), ro.material, np.int32))
            tri_ds.append(np.full(len(tri), mat.double_sided, bool))

    if tri_pos:
        tri_pos = np.concatenate(tri_pos)
        tri_nrm = np.concatenate(tri_nrm)
        tri_tan = np.concatenate(tri_tan)
        tri_uv = np.concatenate(tri_uv)
        tri_mat = np.concatenate(tri_mat)
        tri_ds = np.concatenate(tri_ds)
    else:
        tri_pos = np.zeros((0, 3, 3), np.float32)
        tri_nrm = np.zeros((0, 3, 3), np.float32)
        tri_tan = np.zeros((0, 3, 3), np.float32)
        tri_uv = np.zeros((0, 3, 2), np.float32)
        tri_mat = np.zeros((0,), np.int32)
        tri_ds = np.zeros((0,), bool)

    # Materials.
    mat_base_color, mat_emission, mat_params, mat_tex, mat_flags = \
        _material_arrays(scene)

    # Texture pool with per-texture mip chains.  Texels are QUAD-packed:
    # row (y*w + x) holds the repeat-wrapped 2x2 bilinear footprint
    # [c(x,y), c(x+1,y), c(x,y+1), c(x+1,y+1)], so a bilinear sample is
    # ONE row gather instead of four texel gathers (a TPU gather costs
    # ~10 ms per 2M indices; trilinear drops from 8 gathers to 2).  4x
    # texel memory — textures are a few MB, the trade is free.
    if scene.textures:
        offsets, sizes, chunks = [], [], []
        total = 0
        for tex in scene.textures:
            h, w = tex.shape[:2]
            sizes.append((w, h))
            mip_offsets = []
            level = tex
            for m in range(MAX_TEX_MIPS):
                mip_offsets.append(total)
                chunks.append(_pack_texture_quads(level))
                total += level.shape[0] * level.shape[1]
                if level.shape[0] == 1 and level.shape[1] == 1:
                    # Repeat the last offset for the remaining slots.
                    mip_offsets += [mip_offsets[-1]] * (
                        MAX_TEX_MIPS - m - 1)
                    break
                level = _downsample2(level)
            offsets.append(mip_offsets[:MAX_TEX_MIPS])
        atlas = np.concatenate(chunks)
        tex_offset = np.asarray(offsets, np.int32)
        tex_size = np.asarray(sizes, np.int32)
    else:
        atlas = np.zeros((1, 16), np.uint8)
        tex_offset = np.zeros((1, MAX_TEX_MIPS), np.int32)
        tex_size = np.ones((1, 2), np.int32)

    # Lights, padded to the reference's fixed UBO size (Common.h:4).
    locations, colors = scene.gather_lights()
    light_count = min(len(locations), MAX_LIGHT_COUNT)
    light_location = np.zeros((MAX_LIGHT_COUNT, 4), np.float32)
    light_color = np.zeros((MAX_LIGHT_COUNT, 4), np.float32)
    light_location[:light_count] = locations[:light_count]
    light_color[:light_count] = colors[:light_count]

    env_enabled = env_cube is not None
    if env_cube is None:
        env_cube = np.zeros((6, 1, 1, 3), np.float32)

    any_alpha_test = any(
        (f & MaterialFlags.ALPHA_TEST) and t[0] >= 0
        for f, t in zip(mat_flags, mat_tex))
    any_alpha_blend = any(
        bool(f & MaterialFlags.ALPHA_BLEND) for f in mat_flags)

    tri_shade = pack_tri_shade(tri_nrm, tri_tan, tri_uv, tri_pos, tri_mat,
                               mat_base_color, mat_emission, mat_params,
                               mat_tex, mat_flags)
    mat_packed = pack_materials(mat_base_color, mat_emission, mat_params,
                                mat_flags)

    from steeljax.env.cubemap import pack_cube_quads
    env_quads = pack_cube_quads(np.asarray(env_cube, np.float32))

    # Per-triangle arrays stay HOST (numpy) leaves: jit prunes unused args
    # (keep_unused=False), so paths that never read them (the fused Pallas
    # kernels, the instanced tables) never pay the host->device transfer —
    # on the axon tunnel (~1 MB/s) a 1M-triangle scene's flat arrays are
    # minutes of upload.  prepare_scene promotes to device exactly the
    # arrays its chosen trace/shade path gathers.
    return FlatScene(
        tri_pos=tri_pos, tri_nrm=tri_nrm,
        tri_tan=tri_tan, tri_uv=tri_uv,
        tri_mat=tri_mat, tri_double_sided=tri_ds,
        mat_base_color=jnp.asarray(mat_base_color),
        mat_emission=jnp.asarray(mat_emission),
        mat_params=jnp.asarray(mat_params),
        mat_tex=jnp.asarray(mat_tex),
        mat_flags=jnp.asarray(mat_flags),
        atlas=jnp.asarray(atlas),
        tex_offset=jnp.asarray(tex_offset),
        tex_size=jnp.asarray(tex_size),
        light_location=jnp.asarray(light_location),
        light_color=jnp.asarray(light_color),
        env_cube=jnp.asarray(env_cube),
        tri_shade=tri_shade,
        mat_packed=jnp.asarray(mat_packed),
        mat_emission_linear=jnp.asarray(_to_linear_np(mat_emission)),
        env_quads=jnp.asarray(env_quads),
        light_count=int(light_count),
        env_enabled=bool(env_enabled),
        env_analytic=bool(env_analytic and env_enabled),
        any_alpha_test=bool(any_alpha_test),
        any_alpha_blend=bool(any_alpha_blend),
        has_textures=bool(scene.textures),
        source_tri_count=int(len(tri_pos)),
    )
