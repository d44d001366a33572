"""Forward stage: environment background + alpha-blend surfaces.

Parity with ForwardStage (Stages/Private/ForwardStage.cpp): the
environment cube draws first wherever the opaque depth is still at the
clear value (reverse-z far, Environment.vert/frag force depth to the far
plane), then alpha-blend materials composite with standard alpha blending
(blend state from MaterialPipelineCache.cpp:51-95), depth-tested against
the opaque depth.  The reference draws blend geometry UNSORTED
(ForwardStage.cpp:94-104); steeljax composites up to `max_blend_layers`
blend surfaces per pixel in far-to-near order — every layer the reference
draws, but in the correct order (a strict improvement).  Blending happens
on tone-mapped values, matching the reference's swapchain-space blend.

`all_materials=True` is the kForceForward path (Config.hpp:41): the
G-buffer predicate excludes everything (GBufferStage.cpp:147-157) and the
forward stage draws every material — non-blend materials write opaquely
(their pipelines have blending disabled), alpha-test materials discard
below the cutoff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from steeljax.accel.dispatch import TraceTables, trace_nearest
from steeljax.core.colors import to_linear, tone_map
from steeljax.core.constants import RAY_DEAD_T
from steeljax.env.cubemap import sample_cube_quads
from steeljax.env.environment import Environment
from steeljax.render.hybrid.gbuffer import _interp_cols
from steeljax.render.hybrid.lighting import (compute_direct_lighting,
                                             compute_indirect_lighting)
from steeljax.render.pt import brdf as brdf_lib
from steeljax.render.pt.integrator import _normalize
from steeljax.render.texture import sample_bilinear
from steeljax.scene.flatten import FlatScene
from steeljax.scene.material import MaterialFlags


def _forward_rejected(scene: FlatScene, tables, rec, all_materials: bool):
    """Hits the forward stage must skip: non-blend surfaces (already in
    the G-buffer), or — under kForceForward — alpha-test texels below the
    cutoff (the forward pipelines' ALPHA_TEST define)."""
    from steeljax.render.pt.integrator import shade_rows
    row = shade_rows(scene, tables, rec)
    flags = row[:, 40].astype(jnp.int32)
    blend = (flags & int(MaterialFlags.ALPHA_BLEND)) != 0
    if not all_materials:
        return rec["hit"] & ~blend
    atest = (flags & int(MaterialFlags.ALPHA_TEST)) != 0
    alpha = row[:, 35]
    if scene.has_textures:
        uv = _interp_cols(row, 18, rec["u"], rec["v"], width=2)
        tex = row[:, 41].astype(jnp.int32)
        sampled = sample_bilinear(scene.atlas, scene.tex_offset,
                                  scene.tex_size, tex, uv)[..., 3]
        alpha = alpha * jnp.where(tex >= 0, sampled, 1.0)
    return rec["hit"] & atest & (alpha < row[:, 38])


def trace_blend(scene: FlatScene, tables: TraceTables, o, d, t_min, t_max,
                max_retrace: int = 4, all_materials: bool = False):
    """Nearest forward-stage hit within [t_min, t_max]: the nearest
    alpha-blend material (skipping non-blend surfaces in between — those
    are already in the G-buffer), or with `all_materials` the nearest
    surface of any material (kForceForward).  Re-trace passes run only
    when something was rejected (lax.cond skip)."""
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    rec = trace_nearest(tables, scene.tri_pos, scene.tri_double_sided, o, d,
                        t_min, t_max, cull_backface=True, coherent=True)

    def retrace_pass(rec):
        rejected = _forward_rejected(scene, tables, rec, all_materials)

        def do_retrace(rec):
            # Relative epsilon: an absolute 1e-4 is below one fp32 ulp of
            # t past ~840 units, which silently re-hits far surfaces and
            # burns the retrace budget (ADVICE r3).
            rec2 = trace_nearest(
                tables, scene.tri_pos, scene.tri_double_sided, o, d,
                rec["t"] * (1.0 + 1e-4) + 1e-4,
                jnp.where(rejected, tmax, RAY_DEAD_T),
                cull_backface=True, coherent=True)
            return {k: jnp.where(rejected, rec2[k], rec[k]) for k in rec}

        return jax.lax.cond(jnp.any(rejected), do_retrace, lambda r: r, rec)

    for _ in range(max_retrace):
        rec = retrace_pass(rec)
    ok = rec["hit"] & ~_forward_rejected(scene, tables, rec, all_materials)
    rec["hit"] = ok
    rec["tri"] = jnp.where(ok, rec["tri"], -1)
    return rec


def shade_forward(scene: FlatScene, tables: TraceTables, env: Environment,
                  rec, o, d, camera_position,
                  ray_tracing_enabled: bool = True,
                  all_materials: bool = False,
                  override_material: tuple | None = None):
    """Forward PBR for a blend hit (Forward.frag:25-66).  Returns
    (linear color (N, 3), alpha (N,)).  With `all_materials`, non-blend
    materials return alpha 1 (their pipelines disable blending)."""
    from steeljax.render.pt.integrator import shade_rows
    u, v_bar = rec["u"], rec["v"]
    shade = shade_rows(scene, tables, rec)           # one row read
    p = o + d * rec["t"][..., None]
    uv = _interp_cols(shade, 18, u, v_bar, width=2)

    normal = _normalize(_interp_cols(shade, 0, u, v_bar))
    tangent = _normalize(_interp_cols(shade, 9, u, v_bar))
    view = _normalize(camera_position - p)

    flags = shade[:, 40].astype(jnp.int32)
    ds_mat = (flags & int(MaterialFlags.DOUBLE_SIDED)) != 0
    flip = ds_mat & (jnp.sum(normal * view, axis=-1) < 0.0)
    normal = jnp.where(flip[..., None], -normal, normal)

    # Statically skipped for untextured scenes (shader-define analog).
    if scene.has_textures:
        n_idx = shade[:, 43].astype(jnp.int32)
        ns = sample_bilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             n_idx, uv)[..., :3] * 2.0 - 1.0
        scale = shade[:, 39]
        ns = _normalize(
            ns * jnp.stack([scale, scale, jnp.ones_like(scale)], -1))
        tbn = brdf_lib.make_tbn_with_tangent(normal, tangent)
        mapped = _normalize(brdf_lib.tangent_to_world(ns, tbn))
        normal = jnp.where((n_idx >= 0)[..., None], mapped, normal)

    def tex(slot_col):
        idx = shade[:, slot_col].astype(jnp.int32)
        if not scene.has_textures:
            return jnp.ones(idx.shape + (4,), jnp.float32), idx >= 0
        s = sample_bilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                            idx, uv)
        return s, idx >= 0

    base_s, has_base = tex(41)
    base_raw = shade[:, 46:49] * jnp.where(
        has_base[..., None], base_s[..., :3], 1.0)
    alpha = shade[:, 35] * jnp.where(has_base, base_s[..., 3], 1.0)
    base_color = to_linear(base_raw)

    rm_s, has_rm = tex(42)
    roughness = shade[:, 36] * jnp.where(has_rm, rm_s[..., 1], 1.0)
    metallic = shade[:, 37] * jnp.where(has_rm, rm_s[..., 2], 1.0)
    if override_material is not None:
        # DEBUG_OVERRIDE_MATERIAL (Forward.frag:46-49).
        roughness = jnp.full_like(roughness, override_material[0])
        metallic = jnp.full_like(metallic, override_material[1])

    occ_s, has_occ = tex(44)
    occlusion = shade[:, 52] * jnp.where(has_occ, occ_s[..., 0], 1.0)

    em_s, has_em = tex(45)
    emission = to_linear(shade[:, 49:52] * jnp.where(
        has_em[..., None], em_s[..., :3], 1.0))

    f0 = 0.04 + (base_color - 0.04) * metallic[..., None]
    nov = jnp.maximum(jnp.sum(normal * view, axis=-1), 0.0)

    if scene.light_count > 0:
        direct = compute_direct_lighting(
            scene, tables, p, normal, view, nov, base_color, f0,
            roughness, metallic, shadows=ray_tracing_enabled)
    else:
        direct = jnp.zeros_like(base_color)
    indirect = compute_indirect_lighting(
        env, p, normal, view, nov, base_color, f0, roughness, metallic,
        occlusion)
    if all_materials:
        blend = (flags & int(MaterialFlags.ALPHA_BLEND)) != 0
        alpha = jnp.where(blend, alpha, 1.0)
    return direct + indirect + emission, alpha


def forward_stage(scene: FlatScene, tables: TraceTables, env: Environment,
                  lit_linear, gbuffer, o, d, opaque_t, t_min,
                  camera_position, ray_tracing_enabled: bool = True,
                  max_blend_layers: int = 4, all_materials: bool = False,
                  override_material: tuple | None = None):
    """Compose the final display image: tone-mapped opaque lighting, env
    background, then up to `max_blend_layers` forward layers composited
    far-to-near.  Returns (N, 3) display color."""
    hit = gbuffer["hit"]
    if env.analytic:
        # Procedural sky: the closed form beats the cubemap gather
        # (~10 ms per M indices on TPU) and has no face discretization.
        from steeljax.env.sky import sky_radiance
        env_color = tone_map(sky_radiance(d))
    else:
        env_color = tone_map(sample_cube_quads(env.cube_quads, d))
    display = jnp.where(hit[..., None], tone_map(lit_linear), env_color)

    if not (scene.any_alpha_blend or all_materials):
        return display

    n = o.shape[0]
    blend_tmax = jnp.where(hit, opaque_t, jnp.float32(1000.0))

    def layer(tmin):
        rec = trace_blend(scene, tables, o, d, tmin, blend_tmax,
                          all_materials=all_materials)
        color, alpha = shade_forward(scene, tables, env, rec, o, d,
                                     camera_position, ray_tracing_enabled,
                                     all_materials=all_materials,
                                     override_material=override_material)
        return (rec["hit"], rec["t"], tone_map(color),
                jnp.clip(alpha, 0.0, 1.0))

    # Peel layers near-to-far; layers after the first run only while some
    # ray still has surfaces left (lax.cond skip), so single-layer scenes
    # pay one peel.
    empty = (jnp.zeros((n,), bool), jnp.zeros((n,), jnp.float32),
             jnp.zeros((n, 3), jnp.float32), jnp.zeros((n,), jnp.float32))
    layers = []
    tmin = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    for i in range(max_blend_layers):
        if i == 0:
            hit_i, t_i, src_i, a_i = layer(tmin)
        else:
            hit_i, t_i, src_i, a_i = jax.lax.cond(
                jnp.any(layers[-1][0]), layer, lambda _: empty, tmin)
        layers.append((hit_i, src_i, a_i))
        # Dead interval for finished rays so later peels reject at the
        # root.  Relative epsilon: see trace_blend's retrace note.
        tmin = jnp.where(hit_i, t_i * (1.0 + 1e-4) + 1e-4,
                         blend_tmax + 1.0)

    # Composite far-to-near over the opaque/background image — the blend
    # math of ForwardStage.cpp:94-104 (srcAlpha, oneMinusSrcAlpha), in
    # correct depth order.
    for hit_i, src_i, a_i in reversed(layers):
        a = a_i[..., None]
        display = jnp.where(hit_i[..., None],
                            src_i * a + display * (1.0 - a), display)
    return display
