"""UI overlay burn-in (UIRenderer.cpp:108-112 analog) and hybrid debug
composition switches (Common/PBR.glsl:78-90, Common/Debug.glsl)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from steeljax.core.config import RenderConfig
from steeljax.engine.overlay import burn_overlay, render_text_mask
from steeljax.env.environment import load_environment
from steeljax.env.sky import procedural_sky_cube
from steeljax.render.hybrid.renderer import HybridRenderer
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_cornell_scene

W, H = 48, 27


def test_text_mask_shapes_and_content():
    mask = render_text_mask(["Frame time: 12.34 ms (81.1 FPS)"])
    assert mask.ndim == 2 and mask.any()
    # Distinct strings rasterize differently.
    other = render_text_mask(["Frame time: 99.99 ms (10.0 FPS)"])
    assert mask.shape == other.shape
    assert (mask != other).any()
    # Scaling doubles both extents.
    big = render_text_mask(["AB"], scale=2)
    small = render_text_mask(["AB"])
    assert big.shape == (small.shape[0] * 2, small.shape[1] * 2)


def test_burn_overlay_marks_frame():
    frame = np.full((60, 200, 3), 0.5, np.float32)
    out = burn_overlay(frame, ["Frame time: 1.00 ms (1000.0 FPS)"])
    assert out.shape == frame.shape
    assert (frame == 0.5).all()            # input untouched
    diff = np.abs(out - frame).sum(axis=-1)
    assert (diff > 0).sum() > 100           # text + backing visible
    assert np.isfinite(out).all()
    # Text pixels are white, backing is dimmed.
    assert out.max() == 1.0
    assert out.min() < 0.5


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="heavy render (RUN_SLOW=1 to enable)")
def test_engine_overlay_burns_into_frames():
    from steeljax.engine.engine import Engine
    scene = make_cornell_scene(sphere_detail=4)
    config = RenderConfig(width=32, height=18)
    on = Engine(scene, 32, 18, config, overlay=True)
    off = Engine(scene, 32, 18, config, overlay=False)
    f_on = on.tick(0.1)
    f_off = off.tick(0.1)
    assert f_on.shape == f_off.shape
    assert np.abs(f_on - f_off).max() > 0.05


@pytest.fixture(scope="module")
def hybrid_setup():
    scene = make_cornell_scene(sphere_detail=4)
    flat, tables = prepare_scene(scene, env_resolution=16)
    from steeljax.core import camera as camera_lib
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    env = load_environment(
        cube=procedural_sky_cube(16), irradiance_resolution=4,
        reflection_resolution=8, lut_resolution=16, lut_samples=32,
        reflection_samples=16, irradiance_delta=0.4)
    return scene, flat, tables, frame, env


def _render(hybrid_setup, view):
    scene, flat, tables, frame, env = hybrid_setup
    r = HybridRenderer.__new__(HybridRenderer)
    r.scene, r.width, r.height = scene, W, H
    r.config = RenderConfig(width=W, height=H, debug_view=view)
    r.flat, r.tables, r.env = flat, tables, env
    r.light_volume = None
    r.frame = frame
    return r.render_frame()


def test_debug_views_isolate_channels(hybrid_setup):
    full = _render(hybrid_setup, None)
    views = {v: _render(hybrid_setup, v)
             for v in ("normals", "albedo", "roughness", "depth",
                       "direct", "indirect")}
    for name, img in views.items():
        assert img.shape == (H, W, 3), name
        assert np.isfinite(img).all(), name
        assert 0.0 <= img.min() and img.max() <= 1.0, name
        assert np.abs(img - full).max() > 0.01, name
    # The back wall faces +Z: its normal debug color is ~(0.5, 0.5, 1).
    center = views["normals"][H // 2, W // 2]
    np.testing.assert_allclose(center, [0.5, 0.5, 1.0], atol=0.02)
    # Cornell walls are rough dielectrics: the roughness view is white.
    assert views["roughness"][H // 2, W // 2, 0] > 0.9
    # direct + indirect both contribute to the full frame.
    assert (views["direct"] != views["indirect"]).any()


def _render_cfg(hybrid_setup, **kw):
    scene, flat, tables, frame, env = hybrid_setup
    r = HybridRenderer.__new__(HybridRenderer)
    r.scene, r.width, r.height = scene, W, H
    r.config = RenderConfig(width=W, height=H, **kw)
    r.flat, r.tables, r.env = flat, tables, env
    r.light_volume = None
    r.frame = frame
    return r.render_frame()


def test_debug_views_compose_brdf_terms(hybrid_setup):
    """DEBUG_VIEW_DIFFUSE / DEBUG_VIEW_SPECULAR (Debug.glsl:13-14,
    PBR.glsl:78-90): term isolation is LINEAR pre-tonemap, so
    lit(diffuse) + lit(specular) == lit(both) + emission at the
    deferred-lighting level."""
    import jax.numpy as jnp
    from steeljax.render.hybrid.lighting import deferred_lighting
    from steeljax.render.hybrid.gbuffer import generate_gbuffer
    from steeljax.core.colors import to_linear

    scene, flat, tables, frame, env = hybrid_setup
    n = 64
    xs = (np.arange(n) % W).astype(np.float32)
    ys = (np.arange(n) // W).astype(np.float32)
    u = (xs + 0.5) / W
    v = (ys + 0.5) / H
    xy = np.stack([u, v], -1) * 2.0 - 1.0
    inv_proj = np.asarray(frame.inverse_proj)
    inv_view = np.asarray(frame.inverse_view)
    target = np.concatenate([xy, np.ones((n, 2))], -1) @ inv_proj.T
    d = target[:, :3] / np.linalg.norm(target[:, :3], axis=-1,
                                       keepdims=True)
    d = (np.concatenate([d, np.zeros((n, 1))], -1) @ inv_view.T)[:, :3]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(inv_view[:3, 3], (n, 1))
    gb = generate_gbuffer(flat, tables, jnp.asarray(o, jnp.float32),
                          jnp.asarray(d, jnp.float32),
                          frame.camera_near, frame.camera_far,
                          jnp.asarray(frame.view_proj), inv_view[:3, 3])
    ipv = inv_view @ inv_proj
    uv = jnp.asarray(np.stack([u, v], -1), jnp.float32)

    def lit(view):
        return np.asarray(deferred_lighting(
            flat, tables, env, gb, uv, jnp.asarray(ipv, jnp.float32),
            jnp.asarray(inv_view[:3, 3], jnp.float32), debug_view=view))

    full, diff, spec = lit(None), lit("diffuse"), lit("specular")
    emission = np.asarray(to_linear(gb["emission"]))
    np.testing.assert_allclose(diff + spec, full + emission, atol=1e-4)
    assert np.abs(diff - spec).max() > 1e-4  # the terms actually differ


def test_override_material_changes_shading(hybrid_setup):
    """DEBUG_OVERRIDE_MATERIAL (Debug.glsl:16-18): forcing mirror-metal
    vs rough-dielectric must change the hybrid frame; overriding with a
    value changes shading but not visibility (G-buffer channels agree)."""
    full = _render_cfg(hybrid_setup)
    rough = _render_cfg(hybrid_setup, override_material=(1.0, 0.0))
    mirror = _render_cfg(hybrid_setup, override_material=(0.05, 1.0))
    for img in (rough, mirror):
        assert np.isfinite(img).all()
    assert np.abs(mirror - rough).max() > 0.05
    assert np.abs(mirror - full).max() > 0.01
    # Visibility (depth channel) is untouched by the override.
    d0 = _render_cfg(hybrid_setup, debug_view="depth")
    d1 = _render_cfg(hybrid_setup, debug_view="depth",
                     override_material=(0.05, 1.0))
    np.testing.assert_allclose(d0, d1, atol=1e-6)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="heavy render (RUN_SLOW=1 to enable)")
def test_override_material_pt_mode():
    """PT-mode override (RayGen.rgen:99-102): overriding with the scene's
    own uniform material values is an identity; different values move the
    image."""
    import jax.numpy as jnp
    from steeljax.render.pt.integrator import render_pixels
    from steeljax.scene.builtin import make_parity_scene

    scene = make_parity_scene(sphere_detail=4)
    # Make every material identical so the override can be an identity.
    for m in scene.materials:
        m.roughness_factor = 0.7
        m.metallic_factor = 0.0
    flat, tables = prepare_scene(scene, env_resolution=8)
    from steeljax.core import camera as camera_lib
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    px, py = np.meshgrid(np.arange(24), np.arange(16))
    px = jnp.asarray(px.reshape(-1).astype(np.int32))
    py = jnp.asarray(py.reshape(-1).astype(np.int32))

    def render(cfg):
        return np.asarray(render_pixels(
            flat, tables, jnp.asarray(frame.inverse_view),
            jnp.asarray(frame.inverse_proj), frame.camera_near,
            frame.camera_far, 24, 16, px, py, 0, 0, cfg))

    base = render(RenderConfig(width=24, height=16))
    same = render(RenderConfig(width=24, height=16,
                               override_material=(0.7, 0.0)))
    metal = render(RenderConfig(width=24, height=16,
                                override_material=(0.1, 1.0)))
    np.testing.assert_allclose(base, same, atol=1e-6)
    assert np.abs(metal - base).max() > 0.01
