"""Hybrid pipeline: G-buffer contents, deferred lighting, composite."""

import numpy as np
import jax.numpy as jnp
import pytest

from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.env.environment import load_environment
from steeljax.env.sky import procedural_sky_cube
from steeljax.render.hybrid.gbuffer import generate_gbuffer
from steeljax.render.hybrid.lighting import restore_position
from steeljax.render.hybrid.renderer import HybridRenderer
from steeljax.render.pt.renderer import prepare_scene
from steeljax.render.scene_renderer import RenderMode, SceneRenderer
from steeljax.scene.builtin import make_cornell_scene

W, H = 48, 27


@pytest.fixture(scope="module")
def tiny_env():
    return load_environment(
        cube=procedural_sky_cube(16), irradiance_resolution=4,
        reflection_resolution=8, lut_resolution=16, lut_samples=32,
        reflection_samples=16, irradiance_delta=0.4)


@pytest.fixture(scope="module")
def cornell():
    scene = make_cornell_scene(sphere_detail=4)
    flat, tables = prepare_scene(scene, env_resolution=16)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    return scene, flat, tables, frame


def _center_rays(frame, n=4):
    # Rays straight down -Z from the camera.
    o = np.tile(frame.camera_position, (n, 1)).astype(np.float32)
    d = np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def test_gbuffer_depth_and_normal(cornell):
    scene, flat, tables, frame = cornell
    o, d = _center_rays(frame)
    gb = generate_gbuffer(flat, tables, o, d, frame.camera_near,
                          frame.camera_far, jnp.asarray(frame.view_proj),
                          jnp.asarray(frame.camera_position))
    assert bool(np.asarray(gb["hit"]).all())
    # Center ray hits the back wall at z=-5, 21 units from the camera.
    normal = np.asarray(gb["normal"])[0] * 2 - 1
    np.testing.assert_allclose(normal, [0, 0, 1], atol=0.01)
    # Reverse-z: near hit would be ~1; the back wall is far -> small depth,
    # but still well above the 0 clear value.
    depth = float(np.asarray(gb["depth"])[0])
    assert 0.0 < depth < 0.01


def test_gbuffer_position_roundtrip(cornell):
    scene, flat, tables, frame = cornell
    o, d = _center_rays(frame)
    gb = generate_gbuffer(flat, tables, o, d, frame.camera_near,
                          frame.camera_far, jnp.asarray(frame.view_proj),
                          jnp.asarray(frame.camera_position))
    uv = jnp.full((4, 2), 0.5)
    inverse_proj_view = jnp.asarray(frame.inverse_proj_view)
    pos = np.asarray(restore_position(np.asarray(gb["depth"]), uv,
                                      inverse_proj_view))
    np.testing.assert_allclose(pos[0], [0, 0, -5], atol=0.05)


def test_gbuffer_quantization(cornell):
    scene, flat, tables, frame = cornell
    o, d = _center_rays(frame)
    gb = generate_gbuffer(flat, tables, o, d, frame.camera_near,
                          frame.camera_far, jnp.asarray(frame.view_proj),
                          jnp.asarray(frame.camera_position))
    bc = np.asarray(gb["base_color_occlusion"])
    # 8-bit quantization: values are multiples of 1/255.
    np.testing.assert_allclose(bc * 255, np.round(bc * 255), atol=1e-3)


def test_hybrid_frame_deterministic(cornell, tiny_env):
    scene, flat, tables, frame = cornell
    r = HybridRenderer.__new__(HybridRenderer)
    r.scene, r.width, r.height = scene, W, H
    r.config = RenderConfig(width=W, height=H)
    r.flat, r.tables, r.env = flat, tables, tiny_env
    r.light_volume = None
    r.frame = frame
    a = r.render_frame()
    b = r.render_frame()
    np.testing.assert_array_equal(a, b)
    assert a.shape == (H, W, 3)
    assert np.isfinite(a).all()
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_hybrid_background_is_sky(cornell, tiny_env):
    scene, flat, tables, frame = cornell
    r = HybridRenderer.__new__(HybridRenderer)
    r.scene, r.width, r.height = scene, W, H
    r.config = RenderConfig(width=W, height=H)
    r.flat, r.tables, r.env = flat, tables, tiny_env
    r.light_volume = None
    r.frame = frame
    img = r.render_frame()
    # Corner pixels see past the box: tone-mapped sky is bright.
    assert img[0, 0].mean() > 0.3
    # Interior is lit by IBL (not black).
    assert img[H // 2, W // 2].mean() > 0.05


def test_scene_renderer_mode_toggle(tiny_env):
    scene = make_cornell_scene(sphere_detail=4)
    sr = SceneRenderer(scene, 16, 9, RenderConfig(width=16, height=9),
                       environment=tiny_env)
    assert sr.mode is RenderMode.PATH_TRACING
    pt_img = sr.render_frame()
    assert int(sr.path_tracer.state.index) == 1
    assert sr.toggle_render_mode() is RenderMode.HYBRID
    hy_img = sr.render_frame()
    assert pt_img.shape == hy_img.shape
    assert sr.toggle_render_mode() is RenderMode.PATH_TRACING
    # Re-entering PT resets accumulation (SceneRenderer.cpp:381-384).
    assert int(sr.path_tracer.state.index) == 0
