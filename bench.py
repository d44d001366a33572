"""Benchmarks on one TPU chip — one JSON line per BASELINE.md config.

Configs (headline LAST so single-line parsers pick it up):

1. stress_pt_rays_per_second — multi-M-triangle path tracing, the
   San Miguel-class target (>= 1e8 rays/s/chip).  The reference checkout
   ships no large scene geometry (Assets/Scenes/Sponza/Sponza.bin is
   absent upstream), so the workload is the procedural stress scene:
   the Cornell box packed with instanced spheres/boxes (~1.3M tris,
   2 BVH chunks — exercises the chunked dispatch + per-ray chunk
   pre-cull).
2. hybrid_1080p_ms_per_frame — G-buffer + deferred PBR lighting + ray
   shadows + forward/env composite at 1920x1080 on a Sponza-class
   triangle count with a directional light.  BASELINE.md names no
   number; vs_baseline is reported against a 30 FPS frame budget
   (33.3 ms).
3. cornell_pt_rays_per_second — the reference's default workload
   (CornellBox @ 1280x720, Config.hpp:13,19), 1 spp/frame, <= 4 bounces,
   RR after 2, clamp 8 (RayGen.rgen:18-23).  Ray counts come from
   in-kernel telemetry (every traced segment), not an estimate.
   Baseline 1e8 rays/s/chip.
"""

from __future__ import annotations

import json
import time


def _emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs_baseline}), flush=True)


def bench_cornell_pt() -> None:
    import jax
    import jax.numpy as jnp

    from steeljax.core import camera as camera_lib
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.integrator import render_pixels, tiled_order
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import make_cornell_scene

    width, height = 1280, 720
    frames = 4

    scene = make_cornell_scene(sphere_detail=12)
    flat, tables = prepare_scene(scene, env_resolution=64)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    config = RenderConfig(width=width, height=height)

    px, py, _ = tiled_order(width, height)
    inverse_view = jnp.asarray(frame.inverse_view)
    inverse_proj = jnp.asarray(frame.inverse_proj)

    def step(accum_index):
        return render_pixels(
            flat, tables, inverse_view, inverse_proj,
            frame.camera_near, frame.camera_far, width, height, px, py,
            accum_index, 0, config, return_stats=True)

    result, stats = step(0)
    result.block_until_ready()

    t0 = time.perf_counter()
    for i in range(frames):
        result, stats = step(i + 1)
    result.block_until_ready()
    elapsed = time.perf_counter() - t0
    total_rays = float(stats["rays_traced"]) * frames

    _emit("cornell_pt_rays_per_second", total_rays / elapsed, "rays/s/chip",
          total_rays / elapsed / 1e8)


def bench_stress_pt() -> None:
    import jax
    import jax.numpy as jnp

    from steeljax.core import camera as camera_lib
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.integrator import render_pixels, tiled_order
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import make_stress_scene

    width, height = 1280, 720
    frames = 2

    scene = make_stress_scene(instances=480, sphere_detail=32)
    flat, tables = prepare_scene(scene, env_resolution=64)
    tri_count = int(flat.triangle_count)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    config = RenderConfig(width=width, height=height)

    px, py, _ = tiled_order(width, height)
    inverse_view = jnp.asarray(frame.inverse_view)
    inverse_proj = jnp.asarray(frame.inverse_proj)

    def step(accum_index):
        return render_pixels(
            flat, tables, inverse_view, inverse_proj,
            frame.camera_near, frame.camera_far, width, height, px, py,
            accum_index, 0, config, return_stats=True)

    result, stats = step(0)
    result.block_until_ready()

    t0 = time.perf_counter()
    for i in range(frames):
        result, stats = step(i + 1)
    result.block_until_ready()
    elapsed = time.perf_counter() - t0
    total_rays = float(stats["rays_traced"]) * frames

    _emit(f"stress_pt_rays_per_second_{tri_count}tris",
          total_rays / elapsed, "rays/s/chip", total_rays / elapsed / 1e8)


def bench_foliage_pt() -> None:
    """San Miguel's actual hard part: alpha-test foliage inside traversal.
    1M triangles of textured leaf cards — every canopy hit runs the
    alpha re-trace loop (integrator trace_material_ray; reference
    AnyHit.rahit:25-52)."""
    import jax.numpy as jnp

    from steeljax.core import camera as camera_lib
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.integrator import render_pixels, tiled_order
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import make_foliage_scene

    width, height = 1280, 720
    frames = 2

    scene = make_foliage_scene(cards=500_000)
    flat, tables = prepare_scene(scene, env_resolution=64)
    tri_count = int(flat.triangle_count)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    config = RenderConfig(width=width, height=height)

    px, py, _ = tiled_order(width, height)
    inverse_view = jnp.asarray(frame.inverse_view)
    inverse_proj = jnp.asarray(frame.inverse_proj)

    def step(accum_index):
        return render_pixels(
            flat, tables, inverse_view, inverse_proj,
            frame.camera_near, frame.camera_far, width, height, px, py,
            accum_index, 0, config, return_stats=True)

    result, stats = step(0)
    result.block_until_ready()

    t0 = time.perf_counter()
    for i in range(frames):
        result, stats = step(i + 1)
    result.block_until_ready()
    elapsed = time.perf_counter() - t0
    total_rays = float(stats["rays_traced"]) * frames

    _emit(f"foliage_alpha_pt_rays_per_second_{tri_count}tris",
          total_rays / elapsed, "rays/s/chip", total_rays / elapsed / 1e8)


def bench_hybrid_1080p() -> None:
    import numpy as np

    from steeljax.core.config import RenderConfig
    from steeljax.env.environment import load_environment
    from steeljax.render.hybrid.renderer import HybridRenderer
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import _trs, make_stress_scene
    from steeljax.scene.scene import Entity, Light, LightType

    width, height = 1920, 1080
    frames = 3

    # Sponza-class triangle count (~220k vs Sponza's ~260k) + a
    # directional "sun" for shadow rays.
    scene = make_stress_scene(instances=300, sphere_detail=16)
    sun = Entity(name="sun", local_transform=_trs((0, 0, 0), (0, 0, 1),
                                                  -2.0))
    sun.light = Light(type=LightType.DIRECTIONAL,
                      color=np.array([3.0, 2.9, 2.7], np.float32))
    scene.add_entity(sun)

    prepared = prepare_scene(scene, env_resolution=64)
    # Reduced bake budgets: the metric is the frame, not the startup bake.
    env = load_environment(cube=np.asarray(prepared[0].env_cube),
                           irradiance_resolution=16,
                           reflection_resolution=32, lut_resolution=64,
                           lut_samples=256, reflection_samples=128,
                           irradiance_delta=0.1,
                           analytic=prepared[0].env_analytic)
    config = RenderConfig(width=width, height=height)
    renderer = HybridRenderer(scene, width, height, config,
                              environment=env, prepared=prepared)

    # Device-side frames: the reference's frame ends at the swapchain
    # image; the axon tunnel's host download would dominate otherwise.
    renderer.render_frame_device().block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(frames):
        image = renderer.render_frame_device()
    image.block_until_ready()
    elapsed = time.perf_counter() - t0
    ms = elapsed / frames * 1000.0

    _emit("hybrid_1080p_ms_per_frame", ms, "ms/frame", 33.33 / ms)


CONFIGS = {
    "stress": "bench_stress_pt",
    "foliage": "bench_foliage_pt",
    "hybrid": "bench_hybrid_1080p",
    "cornell": "bench_cornell_pt",
}


def main() -> None:
    import subprocess
    import sys

    if len(sys.argv) > 1:
        globals()[CONFIGS[sys.argv[1]]]()
        return

    # Each config runs in its own process: a heavy config must not
    # degrade or crash the ones after it (measured: running the 1.5M-tri
    # stress config in-process slowed the following Cornell run 3x).
    # Headline metric LAST and never skipped.
    for name in ("stress", "foliage", "hybrid", "cornell"):
        proc = subprocess.run([sys.executable, __file__, name], check=False)
        if proc.returncode != 0 and name == "cornell":
            raise SystemExit(proc.returncode)


if __name__ == "__main__":
    main()
