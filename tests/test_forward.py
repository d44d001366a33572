"""Forward stage: multi-layer alpha-blend compositing (ForwardStage.cpp:
94-104 draws EVERY blend fragment; steeljax peels up to max_blend_layers
and composites far-to-near) and the kForceForward routing
(Config.hpp:41, GBufferStage.cpp:147-157)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from steeljax.core.colors import tone_map
from steeljax.core.config import RenderConfig
from steeljax.env.environment import load_environment
from steeljax.env.sky import procedural_sky_cube
from steeljax.env.cubemap import sample_cube_quads
from steeljax.render.hybrid.forward import (forward_stage, shade_forward,
                                            trace_blend)
from steeljax.render.hybrid.renderer import HybridRenderer
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_cornell_scene, make_quad
from steeljax.scene.material import Material, MaterialFlags
from steeljax.scene.scene import Entity, RenderObject, Scene


@pytest.fixture(scope="module")
def tiny_env():
    return load_environment(
        cube=procedural_sky_cube(16), irradiance_resolution=4,
        reflection_resolution=8, lut_resolution=16, lut_samples=32,
        reflection_samples=16, irradiance_delta=0.4)


def _two_blend_scene():
    """Two overlapping alpha-blend quads (alpha 0.5 red at z=0, alpha 0.4
    blue at z=-2), both 10x10 facing +Z, nothing opaque behind."""
    scene = Scene()
    scene.materials.append(Material(
        base_color_factor=np.asarray([0.8, 0.1, 0.1, 0.5], np.float32),
        flags=MaterialFlags.ALPHA_BLEND | MaterialFlags.DOUBLE_SIDED))
    scene.materials.append(Material(
        base_color_factor=np.asarray([0.1, 0.1, 0.8, 0.4], np.float32),
        flags=MaterialFlags.ALPHA_BLEND | MaterialFlags.DOUBLE_SIDED))
    scene.primitives.append(make_quad(10.0))
    front = Entity(name="front", render_objects=[RenderObject(0, 0)])
    scene.add_entity(front)
    back = Entity(name="back", render_objects=[RenderObject(0, 1)])
    back.local_transform[:3, 3] = [0, 0, -2.0]
    scene.add_entity(back)
    return scene


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="heavy render (RUN_SLOW=1 to enable)")
def test_two_layer_blend_matches_reference_math(tiny_env):
    scene = _two_blend_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    assert flat.any_alpha_blend

    n = 4
    o = jnp.asarray(np.tile([0.0, 0.0, 5.0], (n, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32))
    cam = jnp.asarray([0.0, 0.0, 5.0], jnp.float32)
    gbuffer = {"hit": jnp.zeros((n,), bool)}
    lit = jnp.zeros((n, 3), jnp.float32)
    opaque_t = jnp.full((n,), 1000.0, jnp.float32)

    out = np.asarray(forward_stage(
        flat, tables, tiny_env, lit, gbuffer, o, d, opaque_t, 0.001, cam))

    # Manual composite per the reference blend state (srcAlpha,
    # oneMinusSrcAlpha — MaterialPipelineCache.cpp:51-95), far-to-near.
    rec1 = trace_blend(flat, tables, o, d, 0.001, 1000.0)
    assert bool(np.asarray(rec1["hit"]).all())
    np.testing.assert_allclose(np.asarray(rec1["t"]), 5.0, atol=1e-3)
    c1, a1 = shade_forward(flat, tables, tiny_env, rec1, o, d, cam)
    rec2 = trace_blend(flat, tables, o, d, rec1["t"] + 1e-4, 1000.0)
    assert bool(np.asarray(rec2["hit"]).all())
    np.testing.assert_allclose(np.asarray(rec2["t"]), 7.0, atol=1e-3)
    c2, a2 = shade_forward(flat, tables, tiny_env, rec2, o, d, cam)

    bg = tone_map(sample_cube_quads(tiny_env.cube_quads, d))
    a2c = jnp.clip(a2, 0, 1)[..., None]
    a1c = jnp.clip(a1, 0, 1)[..., None]
    display = tone_map(c2) * a2c + bg * (1.0 - a2c)
    display = tone_map(c1) * a1c + display * (1.0 - a1c)
    np.testing.assert_allclose(out, np.asarray(display), atol=1e-5)

    np.testing.assert_allclose(np.asarray(a1), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a2), 0.4, atol=1e-6)

    # A single-layer composite would drop the back quad entirely.
    single = np.asarray(forward_stage(
        flat, tables, tiny_env, lit, gbuffer, o, d, opaque_t, 0.001, cam,
        max_blend_layers=1))
    only_front = np.asarray(tone_map(c1) * a1c + bg * (1.0 - a1c))
    np.testing.assert_allclose(single, only_front, atol=1e-5)
    assert np.abs(out - single).max() > 1e-3


def test_blend_layers_depth_tested_against_opaque(tiny_env):
    """Blend surfaces behind the opaque depth are invisible."""
    scene = _two_blend_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    n = 2
    o = jnp.asarray(np.tile([0.0, 0.0, 5.0], (n, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)).astype(np.float32))
    cam = jnp.asarray([0.0, 0.0, 5.0], jnp.float32)
    # Pretend an opaque surface at t=6: only the front quad (t=5) shows.
    gbuffer = {"hit": jnp.ones((n,), bool)}
    lit = jnp.full((n, 3), 0.25, jnp.float32)
    opaque_t = jnp.full((n,), 6.0, jnp.float32)
    out = np.asarray(forward_stage(
        flat, tables, tiny_env, lit, gbuffer, o, d, opaque_t, 0.001, cam))

    rec1 = trace_blend(flat, tables, o, d, 0.001, opaque_t)
    c1, a1 = shade_forward(flat, tables, tiny_env, rec1, o, d, cam)
    a1c = jnp.clip(a1, 0, 1)[..., None]
    expected = np.asarray(tone_map(c1) * a1c
                          + tone_map(lit) * (1.0 - a1c))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_force_forward_matches_deferred_on_opaque_scene(tiny_env):
    """kForceForward pushes everything through the forward path; on an
    all-opaque scene the image must agree with the deferred pipeline up
    to G-buffer quantization (GBufferStage.cpp:147-157 predicate)."""
    W, H = 48, 27
    scene = make_cornell_scene(sphere_detail=4)
    flat, tables = prepare_scene(scene, env_resolution=16)
    from steeljax.core import camera as camera_lib
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)

    def render(force):
        r = HybridRenderer.__new__(HybridRenderer)
        r.scene, r.width, r.height = scene, W, H
        r.config = RenderConfig(width=W, height=H, force_forward=force)
        r.flat, r.tables, r.env = flat, tables, tiny_env
        r.light_volume = None
        r.frame = frame
        return r.render_frame()

    deferred = render(False)
    forward = render(True)
    assert forward.shape == (H, W, 3)
    assert np.isfinite(forward).all()
    # Same lighting math at fragment rate: close up to 8/10-bit G-buffer
    # quantization and the depth-reconstruction round-trip.
    rmse = float(np.sqrt(np.mean((forward - deferred) ** 2)))
    assert rmse < 0.03, rmse
