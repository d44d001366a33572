"""White-furnace energy-conservation property test (SURVEY.md §4).

A CONVEX albedo-1 Lambertian object in a uniform environment must render
exactly the environment radiance: a cosine-sampled diffuse bounce off a
convex surface cannot re-hit it, and the estimator f*cos/pdf for the
Lambert lobe is exactly the albedo — so any energy gain/loss here is an
integrator bug (BRDF normalization, pdf mismatch, RR weighting, env
weighting), not noise.
"""

import numpy as np
import jax.numpy as jnp

from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.render.pt.integrator import render_sample
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import _trs
from steeljax.scene.material import Material
from steeljax.scene.primitive import make_uv_sphere
from steeljax.scene.scene import Entity, RenderObject, Scene

W, H = 32, 24
ENV = (0.5, 0.5, 0.5)


def _furnace_scene() -> Scene:
    scene = Scene()
    scene.materials.append(Material(
        base_color_factor=np.array([1, 1, 1, 1], np.float32),
        roughness_factor=1.0, metallic_factor=0.0))
    scene.primitives.append(make_uv_sphere(1.0, 12, 24))
    scene.add_entity(Entity(name="ball", local_transform=_trs((0, 0, 0)),
                            render_objects=[RenderObject(0, 0)]))
    scene.environment_color = ENV
    scene.camera_location = camera_lib.CameraLocation(
        position=np.array([0, 0, 5], np.float32),
        direction=np.array([0, 0, -1], np.float32), up=camera_lib.UP)
    scene.camera_projection = camera_lib.CameraProjection(
        y_fov=0.6, width=float(W) / H, height=1.0, z_near=0.01,
        z_far=100.0)
    return scene


def test_white_furnace():
    scene = _furnace_scene()
    flat, tables = prepare_scene(scene, env_resolution=16,
                                 use_default_environment=False)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    # sample_count unrolls inside one jit (slow compile); accumulate a
    # few cheap frames instead (one compile, distinct RNG streams).
    config = RenderConfig(width=W, height=H, sample_count=4)
    img = np.mean([np.asarray(render_sample(
        flat, tables, jnp.asarray(frame.inverse_view),
        jnp.asarray(frame.inverse_proj), frame.camera_near,
        frame.camera_far, W, H, a, 0, config)) for a in range(8)], axis=0)

    # Background pixels see the env directly: exact.
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    np.testing.assert_allclose(corners, np.broadcast_to(ENV, (4, 3)),
                               atol=1e-4)
    # Sphere-center pixels: every path leaves the convex body into the
    # same uniform env.  Per-sample variance exists (mixed GGX lobes can
    # sample below the horizon and die with zero contribution — the
    # reference's RayGen kill rule), so the PROPERTY is the mean: energy
    # conserved in expectation, no gain anywhere.
    center = img[H // 2 - 2:H // 2 + 2, W // 2 - 2:W // 2 + 2]
    np.testing.assert_allclose(center.mean(axis=(0, 1)), ENV, atol=0.02)
    assert float(img.max()) <= ENV[0] * 1.02 + 1e-4, "energy GAIN"

