"""Deferred PBR lighting with ray-traced hard shadows.

Parity with Hybrid/Lighting.comp + Lighting.glsl: world position is
reconstructed from reverse depth via inverseProjView (Lighting.comp:18-26),
direct lighting loops punctual lights with GGX/Schlick/Vis and a
terminate-on-first-hit shadow ray — a pixel is lit only when the
visibility ray misses (Lighting.glsl:229-234); indirect lighting is the
split-sum IBL: irradiance map diffuse + prefiltered reflection x
(F0*scale+offset) LUT specular, scaled by occlusion
(Lighting.glsl:245-272).  Optionally samples a light volume for diffuse GI
(LIGHT_VOLUME_ENABLED) with the irradiance-ratio specular renormalization.
"""

from __future__ import annotations

import jax.numpy as jnp

from steeljax.accel.dispatch import TraceTables
from steeljax.core.colors import to_linear
from steeljax.core.constants import (BIAS, DIELECTRIC_F0, EPSILON,
                                     RAY_DEAD_T, RAY_MAX_T, RAY_MIN_T)
from steeljax.env.cubemap import sample_cube_quads, sample_flat_mips
from steeljax.env.environment import Environment
from steeljax.render.pt import brdf as brdf_lib
from steeljax.render.pt.integrator import _normalize, trace_visibility
from steeljax.scene.flatten import FlatScene


def restore_position(depth, uv, inverse_proj_view):
    """RestorePosition (Lighting.comp:18-26)."""
    clip = jnp.concatenate([uv * 2.0 - 1.0, depth[..., None],
                            jnp.ones_like(depth[..., None])], axis=-1)
    world = jnp.einsum("ij,nj->ni", inverse_proj_view, clip)
    return world[..., :3] / jnp.where(
        jnp.abs(world[..., 3:4]) < 1e-20, 1e-20, world[..., 3:4])


def compute_direct_lighting(scene: FlatScene, tables: TraceTables,
                            position, n, v, nov, base_color, f0,
                            roughness, metallic, max_alpha_retrace: int = 4,
                            shadows: bool = True, live=None,
                            compose: str = "both"):
    """ComputeDirectLighting (Lighting.glsl:186-243), vectorized over
    pixels with a static unrolled loop over the scene's lights.

    `live` masks pixels whose shading result is consumed (G-buffer hits);
    sky pixels get an inverted shadow interval — the compute-shader
    analog of the early depth-miss return, worth the whole sky fraction
    of the shadow trace."""
    total = jnp.zeros_like(base_color)
    for i in range(scene.light_count):
        loc = scene.light_location[i]
        color = scene.light_color[i, :3]
        is_point = loc[3]

        a = roughness * roughness
        a2 = a * a

        direction = loc[:3] - position * is_point
        distance = jnp.where(is_point == 0.0, RAY_MAX_T,
                             jnp.linalg.norm(direction, axis=-1))
        attenuation = jnp.where(
            is_point == 0.0, 1.0,
            1.0 / jnp.maximum(distance * distance, 1e-20))

        l = _normalize(direction)
        h = _normalize(l + v)
        nol = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
        noh = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
        voh = jnp.maximum(jnp.sum(v * h, axis=-1), 0.0)

        lum = jnp.float32(0.2126 * color[0] + 0.7152 * color[1]
                          + 0.0722 * color[2])
        irradiance = attenuation * nol * lum

        d_term = brdf_lib.d_ggx(a2, noh)
        f_term = brdf_lib.f_schlick(f0, voh)
        vis = brdf_lib.vis_schlick(a, nov, nol)
        kd = (1.0 - f_term) * (1.0 - metallic)[..., None]
        diffuse = kd * brdf_lib.diffuse_lambert(base_color)
        specular = d_term[..., None] * f_term * vis[..., None]

        if shadows:
            origin = position + n * BIAS
            # Shadow rays only where the light can contribute
            # (Lighting.glsl:226-236 traces inside `irradiance > EPSILON`):
            # backfacing/unlit/sky pixels get an inverted interval, which
            # the packet kernel rejects at the root — on the hybrid bench
            # this halves the shadow-trace cost.
            contributes = irradiance > EPSILON
            if live is not None:
                contributes = contributes & live
            t_far = jnp.where(contributes, distance, RAY_DEAD_T)
            occluded = trace_visibility(
                scene, tables, origin, l, RAY_MIN_T, t_far,
                max_alpha_retrace, coherent=True).astype(jnp.float32)
        else:
            occluded = jnp.zeros_like(nol)  # RAY_TRACING_ENABLED=0 path

        lighting = (nol * attenuation)[..., None] * color * (
            1.0 - occluded)[..., None]
        contribution = brdf_lib.compose_brdf(diffuse, specular,
                                             compose) * lighting
        total = total + jnp.where((irradiance > EPSILON)[..., None],
                                  contribution, 0.0)
    return total


def env_brdf_scale_offset(env: Environment, nov, roughness):
    """Split-sum BRDF scale/offset.  Uses Karis's analytic quartic fit of
    the LUT ("Physically Based Material on Mobile") — within ~1% of the
    MC-integrated table, with no per-pixel gather.  The baked LUT remains
    the parity/verification artifact (env.ibl.specular_brdf_lut,
    tests/test_ibl.py)."""
    r = (roughness[..., None]
         * jnp.asarray([-1.0, -0.0275, -0.572, 0.022], jnp.float32)
         + jnp.asarray([1.0, 0.0425, 1.04, -0.04], jnp.float32))
    a004 = (jnp.minimum(r[..., 0] * r[..., 0], jnp.exp2(-9.28 * nov))
            * r[..., 0] + r[..., 1])
    return jnp.stack([a004 * -1.04 + r[..., 2],
                      a004 * 1.04 + r[..., 3]], axis=-1)


def compute_indirect_lighting(env: Environment, position, n, v, nov,
                              base_color, f0, roughness, metallic,
                              occlusion, light_volume=None,
                              compose: str = "both"):
    """ComputeIndirectLighting (Lighting.glsl:245-272)."""
    # Irradiance lookup: the least-squares SH fit (inline basis + tiny
    # matmul, no gather) when the bake accepted one, else the exact
    # quad-row gather.  A fixed ANALYTIC-projection SH-9 was tried in
    # round 2 and failed the PT/hybrid parity gate (RMSE 0.066 vs 0.026):
    # the residual-gated least-squares fit is the version that holds
    # (env.ibl.fit_cube_sh).
    def env_irr(direction):
        if env.irradiance_sh is not None:
            from steeljax.env.ibl import eval_cube_sh
            return eval_cube_sh(env.irradiance_sh, direction)
        return sample_cube_quads(env.irradiance_quads, direction)

    if light_volume is not None:
        from steeljax.gi.sample import sample_light_volume
        irradiance = sample_light_volume(light_volume, position, n)
        env_irradiance = env_irr(n)
        # The reference divides raw (Lighting.glsl:252); bound the ratio so
        # near-zero env irradiance cannot blow up the specular term.
        specular_norm = jnp.clip(
            irradiance / jnp.maximum(env_irradiance, 1e-4), 0.0, 8.0)
    else:
        irradiance = env_irr(n)
        specular_norm = jnp.ones_like(irradiance)

    ks = brdf_lib.f_schlick_roughness(f0, nov, roughness)
    kd = (1.0 - ks) * (1.0 - metallic)[..., None]

    r = 2.0 * jnp.sum(v * n, axis=-1, keepdims=True) * n - v
    mips = len(env.reflection_mips)
    lod = roughness * (mips - 1)
    if env.reflection_tri_data is not None:
        # Mip-pair rows: trilinear in ONE gather (bit-exact with the
        # two-gather form below; cubemap.pack_mips_tri).
        from steeljax.env.cubemap import sample_flat_mips_tri
        reflection = sample_flat_mips_tri(env.reflection_tri_data,
                                          env.reflection_offsets,
                                          env.reflection_sizes, r, lod)
    else:
        reflection = sample_flat_mips(env.reflection_data,
                                      env.reflection_offsets,
                                      env.reflection_sizes, r, lod)

    scale_offset = env_brdf_scale_offset(env, nov, roughness)

    diffuse = kd * irradiance * base_color
    specular = (f0 * scale_offset[..., 0:1]
                + scale_offset[..., 1:2]) * reflection
    return brdf_lib.compose_brdf(
        diffuse, specular * specular_norm, compose) * occlusion[..., None]


def deferred_lighting(scene: FlatScene, tables: TraceTables,
                      env: Environment, gbuffer, uv, inverse_proj_view,
                      camera_position, light_volume=None,
                      ray_tracing_enabled: bool = True,
                      debug_view: str | None = None,
                      override_material: tuple | None = None):
    """Lighting.comp main: unpack G-buffer -> direct + indirect + emission.
    Returns linear HDR color (tone mapping happens at composite).

    `debug_view` in {"direct", "indirect"} isolates one lighting term and
    {"diffuse", "specular"} one ComposeBRDF term — the composition
    switches of Common/PBR.glsl:78-90 / Debug.glsl as a jit constant
    instead of a shader define.  `override_material` forces (roughness,
    metallic) post-unpack (DEBUG_OVERRIDE_MATERIAL, Lighting.comp:45-48).
    """
    depth = gbuffer["depth"]
    position = restore_position(depth, uv, inverse_proj_view)

    n = gbuffer["normal"] * 2.0 - 1.0
    emission = to_linear(gbuffer["emission"])
    base_color = to_linear(gbuffer["base_color_occlusion"][..., :3])
    occlusion = gbuffer["base_color_occlusion"][..., 3]
    roughness = gbuffer["rough_metal"][..., 0]
    metallic = gbuffer["rough_metal"][..., 1]
    if override_material is not None:
        roughness = jnp.full_like(roughness, override_material[0])
        metallic = jnp.full_like(metallic, override_material[1])
    compose = debug_view if debug_view in ("diffuse", "specular") \
        else "both"

    f0 = DIELECTRIC_F0 + (base_color - DIELECTRIC_F0) * metallic[..., None]
    v = _normalize(camera_position - position)
    nov = jnp.maximum(jnp.sum(n * v, axis=-1), 0.0)

    if scene.light_count > 0:
        direct = compute_direct_lighting(
            scene, tables, position, n, v, nov, base_color, f0,
            roughness, metallic, shadows=ray_tracing_enabled,
            live=gbuffer["hit"], compose=compose)
    else:
        direct = jnp.zeros_like(base_color)

    indirect = compute_indirect_lighting(
        env, position, n, v, nov, base_color, f0, roughness, metallic,
        occlusion, light_volume, compose=compose)

    if debug_view == "direct":
        return direct
    if debug_view == "indirect":
        return indirect
    return direct + indirect + emission
