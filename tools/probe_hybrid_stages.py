"""Hybrid frame stage ablation on the bench workload (on-chip).

Replaces the uncommitted round-3/4 scratch ablations: times the full
frame against static-toggle variants, so stage costs fall out as
deltas (each toggle is a jit specialization, warmed before timing):

  full                 — the bench configuration
  no_shadows           — ray_tracing_enabled=False (shadow trace = 0)
  gbuffer_only         — debug_view="normals" (primary trace + quantize)

Run: JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/probe_hybrid_stages.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main(width: int = 1920, height: int = 1080, frames: int = 3) -> None:
    from steeljax.core.config import RenderConfig
    from steeljax.env.environment import load_environment
    from steeljax.render.hybrid.renderer import HybridRenderer
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import _trs, make_stress_scene
    from steeljax.scene.scene import Entity, Light, LightType

    scene = make_stress_scene(instances=300, sphere_detail=16)
    sun = Entity(name="sun", local_transform=_trs((0, 0, 0), (0, 0, 1),
                                                  -2.0))
    sun.light = Light(type=LightType.DIRECTIONAL,
                      color=np.array([3.0, 2.9, 2.7], np.float32))
    scene.add_entity(sun)
    prepared = prepare_scene(scene, env_resolution=64)
    env = load_environment(cube=np.asarray(prepared[0].env_cube),
                           irradiance_resolution=16,
                           reflection_resolution=32, lut_resolution=64,
                           lut_samples=256, reflection_samples=128,
                           irradiance_delta=0.1,
                           analytic=prepared[0].env_analytic)

    base = RenderConfig(width=width, height=height)
    variants = {
        "full": base,
        "no_shadows": dataclasses.replace(base,
                                          ray_tracing_enabled=False),
        "gbuffer_only": dataclasses.replace(base, debug_view="normals"),
    }

    times = {}
    for name, config in variants.items():
        renderer = HybridRenderer(scene, width, height, config,
                                  environment=env, prepared=prepared)
        renderer.render_frame_device().block_until_ready()  # warm
        t0 = time.perf_counter()
        for _ in range(frames):
            image = renderer.render_frame_device()
        image.block_until_ready()
        ms = (time.perf_counter() - t0) / frames * 1000.0
        times[name] = ms
        print(f"{name:14s} {ms:8.2f} ms/frame", flush=True)

    full = times["full"]
    print(f"\nderived stages (of {full:.1f} ms):")
    print(f"  shadow trace + lighting-on-shadow : "
          f"{full - times['no_shadows']:.1f} ms")
    print(f"  primary trace + gbuffer quantize  : "
          f"{times['gbuffer_only']:.1f} ms")
    print(f"  lighting/IBL/forward remainder    : "
          f"{times['no_shadows'] - times['gbuffer_only']:.1f} ms")


if __name__ == "__main__":
    main()
