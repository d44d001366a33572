"""Path-tracer behavior: determinism, emission, accumulation, environment."""

import numpy as np
import jax.numpy as jnp
import pytest

from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.render.pt.integrator import render_sample
from steeljax.render.pt.renderer import (PathTracingRenderer, accumulate,
                                         init_accumulation, prepare_scene)
from steeljax.scene.builtin import make_cornell_scene

W, H = 32, 24


@pytest.fixture(scope="module")
def cornell():
    scene = make_cornell_scene(sphere_detail=4)
    flat, bvh = prepare_scene(scene, env_resolution=16)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    return scene, flat, bvh, frame


def _render(flat, bvh, frame, accum=0, config=None):
    config = config or RenderConfig(width=W, height=H)
    return np.asarray(render_sample(
        flat, bvh, jnp.asarray(frame.inverse_view),
        jnp.asarray(frame.inverse_proj), frame.camera_near,
        frame.camera_far, W, H, accum, 0, config))


def test_deterministic(cornell):
    _, flat, bvh, frame = cornell
    a = _render(flat, bvh, frame)
    b = _render(flat, bvh, frame)
    np.testing.assert_array_equal(a, b)


def test_accumulation_index_changes_noise(cornell):
    _, flat, bvh, frame = cornell
    a = _render(flat, bvh, frame, accum=0)
    b = _render(flat, bvh, frame, accum=1)
    assert not np.array_equal(a, b)


def test_environment_visible_outside_box(cornell):
    _, flat, bvh, frame = cornell
    img = _render(flat, bvh, frame)
    # The corner pixels look past the box into the sky.
    assert img[0, 0].sum() > 0.05
    assert img[-1, 0].sum() > 0.05


def test_image_finite_and_clamped(cornell):
    _, flat, bvh, frame = cornell
    img = _render(flat, bvh, frame)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert img.max() <= 8.0 + 1e-5  # MAX_IRRADIANCE clamp


def test_interior_receives_light(cornell):
    _, flat, bvh, frame = cornell
    imgs = [_render(flat, bvh, frame, accum=i) for i in range(8)]
    mean = np.mean(imgs, axis=0)
    # Center view hits the box interior; with the sky + lamp it cannot be
    # black on average.
    interior = mean[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4]
    assert interior.mean() > 0.02


def test_accumulation_running_mean():
    state = init_accumulation(4, 4)
    a = jnp.full((4, 4, 3), 1.0)
    b = jnp.full((4, 4, 3), 3.0)
    state = accumulate(state, a)
    state = accumulate(state, b)
    np.testing.assert_allclose(np.asarray(state.accumulated), 2.0, atol=1e-6)
    assert int(state.index) == 2


def test_renderer_class_accumulates():
    scene = make_cornell_scene(sphere_detail=4)
    r = PathTracingRenderer(scene, 16, 12,
                            RenderConfig(width=16, height=12))
    img1 = r.render_frame()
    assert int(r.state.index) == 1
    img2 = r.render_frame()
    assert int(r.state.index) == 2
    assert img1.shape == (12, 16, 3)
    assert not np.array_equal(img1, img2)
    r.reset_accumulation()
    assert int(r.state.index) == 0


def test_repack_bounces_match_unrepacked(cornell, monkeypatch):
    """The per-bounce ray repack (stable payload sort + slot restore) must
    be a pure reordering: per-ray RNG streams travel with the rays, so the
    image is bit-identical with the repack forced on."""
    from steeljax.render.pt import integrator

    _, flat, bvh, frame = cornell
    baseline = _render(flat, bvh, frame)
    monkeypatch.setattr(integrator, "REPACK_MIN_TRIS", -1)
    integrator.render_pixels._clear_cache()
    repacked = _render(flat, bvh, frame)
    integrator.render_pixels._clear_cache()
    np.testing.assert_array_equal(baseline, repacked)
