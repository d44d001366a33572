"""Headline benchmark: path-tracing throughput on one TPU chip.

Renders the built-in Cornell scene (the reference's default workload,
Config.hpp:19) at 1280x720, 1 spp/frame with the reference's exact kernel
budget (<=4 bounces, RR after 2, clamp 8 — RayGen.rgen:18-23), and reports
measured ray throughput.  Ray counts come from in-kernel telemetry (every
traced segment + shadow ray), not an estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 1e8 rays/s/chip (BASELINE.md target; the reference publishes no
numbers).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
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

    # Warmup/compile.
    result, stats = step(0)
    result.block_until_ready()

    total_rays = 0.0
    t0 = time.perf_counter()
    for i in range(frames):
        result, stats = step(i + 1)
    result.block_until_ready()
    elapsed = time.perf_counter() - t0
    total_rays = float(stats["rays_traced"]) * frames

    rays_per_s = total_rays / elapsed
    baseline = 1e8
    print(json.dumps({
        "metric": "cornell_pt_rays_per_second",
        "value": rays_per_s,
        "unit": "rays/s/chip",
        "vs_baseline": rays_per_s / baseline,
    }))


if __name__ == "__main__":
    main()
