"""Benchmarks on one TPU chip — one JSON line per BASELINE.md config.

The headline (cornell) RUNS first — under a wall-clock budget its capture
must never be lost (round 4's driver run timed out mid-suite) — but its
JSON line is RE-EMITTED as the very last line so single-line parsers
still pick it up.  Configs that no longer fit the budget
(STEELJAX_BENCH_BUDGET_S, default 1500 s) emit {"skipped": true} lines.

Configs:

1. stress_pt_rays_per_second — multi-M-triangle path tracing, the
   San Miguel-class target (>= 1e8 rays/s/chip).  The reference checkout
   ships no large scene geometry (Assets/Scenes/Sponza/Sponza.bin is
   absent upstream), so the workload is the procedural stress scene:
   the Cornell box packed with instanced spheres/boxes.
2. stress_tex_pt_rays_per_second — the same geometry with textured
   materials (opaque): uv interpolation + bilinear atlas sampling at
   full scene scale, quantifying the textured-shading cost next to 1.
3. foliage_alpha_pt_rays_per_second — alpha-test foliage (the San Miguel
   hard part): in-kernel coverage masks + the exact bounded re-trace,
   on the ADVERSARIAL serrated texture (no provably-opaque cells).
3b. foliage_solid_pt_rays_per_second — the same canopy with solid leaf
   interiors (realistic assets): fine OPAQUE-plane termination applies.
4. hybrid_1080p_ms_per_frame — G-buffer + deferred PBR lighting + ray
   shadows + forward/env composite at 1920x1080 on a Sponza-class
   triangle count with a directional light.  BASELINE.md names no
   number; vs_baseline is reported against a 30 FPS frame budget
   (33.3 ms).
5. kernel_parity — regenerates docs/kernel_parity.json on this chip and
   FAILS the bench run on any variant mismatch, so every driver BENCH
   capture is also a kernel-correctness capture (the always-on
   validation-layer analog, reference Private/Instance.cpp:59-70).
6. cornell_pt_rays_per_second — the reference's default workload
   (CornellBox @ 1280x720, Config.hpp:13,19), 1 spp/frame, <= 4 bounces,
   RR after 2, clamp 8 (RayGen.rgen:18-23).  Ray counts come from
   in-kernel telemetry (every traced segment), not an estimate.
   Baseline 1e8 rays/s/chip.

Triangle counts in metric names are REAL (pre-padding) triangle counts;
the BVH row-alignment padding (bvh._align_leaves) is an implementation
detail that previously inflated cross-round labels (ADVICE r3).
"""

from __future__ import annotations

import json
import os
import time

# Persistent XLA compilation cache: each config runs in its own process
# (see main()), and without this every subprocess re-pays the full
# compile (~234 s for the big configs; ~13 s cached).  setdefault so an
# explicit override wins; subprocesses inherit it via the environment.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")


def _emit(metric: str, value: float, unit: str, vs_baseline: float) -> None:
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": vs_baseline}), flush=True)


def _real_tris(flat) -> int:
    """True source triangle count.  flat.tri_pos is a REFERENCE layout
    (SBVH spatial splits duplicate straddling triangles), so counting
    non-pad slots would overcount; flatten_scene records the real count."""
    if getattr(flat, "source_tri_count", -1) >= 0:
        return int(flat.source_tri_count)
    import numpy as np
    return int((np.asarray(flat.tri_pos)[:, 0, 0] < 3.0e36).sum())


def _sanity_check_frame(result, stats, pixel_count: int) -> None:
    """Refuse to emit a corrupt capture (round 5 saw one 3.1e9 rays/s
    line from a garbage stat): the telemetry must be a plausible
    segments-per-pixel count, and a sampled slice of the frame must be
    finite and non-constant.  The slice keeps the host download tiny
    (the axon tunnel is ~1 MB/s)."""
    import numpy as np
    rays = float(stats["rays_traced"])
    assert pixel_count * 0.5 <= rays <= pixel_count * 40, (
        f"rays_traced telemetry implausible: {rays} for "
        f"{pixel_count} pixels")
    sample = np.asarray(result[:: max(result.shape[0] // 4096, 1)])
    assert np.isfinite(sample).all(), "non-finite pixels in bench frame"
    assert float(sample.std()) > 0.0, "constant bench frame"


def _bench_pt(scene, metric_prefix: str, frames: int = 2) -> None:
    """Shared PT bench body: prepare, warm, time `frames` 1-spp frames."""
    import jax.numpy as jnp

    from steeljax.core import camera as camera_lib
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.integrator import render_pixels, tiled_order
    from steeljax.render.pt.renderer import prepare_scene

    width, height = 1280, 720
    flat, tables = prepare_scene(scene, env_resolution=64)
    tri_count = _real_tris(flat)
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

    _sanity_check_frame(result, stats, width * height)
    _emit(f"{metric_prefix}_{tri_count}tris", total_rays / elapsed,
          "rays/s/chip", total_rays / elapsed / 1e8)


def bench_cornell_pt() -> None:
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

    _sanity_check_frame(result, stats, width * height)
    _emit("cornell_pt_rays_per_second", total_rays / elapsed, "rays/s/chip",
          total_rays / elapsed / 1e8)


def bench_stress_pt() -> None:
    from steeljax.scene.builtin import make_stress_scene
    _bench_pt(make_stress_scene(instances=480, sphere_detail=32),
              "stress_pt_rays_per_second")


def bench_stress_tex_pt() -> None:
    """Textured-opaque large scene: the same 1.7M-tri geometry with a
    base-color texture on the instanced materials, exercising uv
    interpolation + bilinear atlas sampling (shade path) at scale —
    quantifies the textured-shading cost next to bench_stress_pt."""
    from steeljax.scene.builtin import make_stress_scene
    _bench_pt(make_stress_scene(instances=480, sphere_detail=32,
                                textured=True),
              "stress_tex_pt_rays_per_second")


def bench_foliage_pt() -> None:
    """San Miguel's actual hard part: alpha-test foliage.  Traversal
    rejects provably-transparent hits via in-kernel coverage masks
    (accel.alphamask; reference AnyHit.rahit:25-52) and the integrator's
    bounded re-trace resolves boundary cells exactly.  This is the
    ADVERSARIAL texture (serrated: texel-scale perforations defeat every
    opaque-coverage proof); bench_foliage_solid_pt is the realistic
    counterpart."""
    from steeljax.scene.builtin import make_foliage_scene
    _bench_pt(make_foliage_scene(cards=500_000),
              "foliage_alpha_pt_rays_per_second")


def bench_foliage_solid_pt() -> None:
    """The same canopy with solid-interior leaf textures (the common
    real-asset profile): the fine OPAQUE coverage plane (accel.alphamask)
    lets leaf-interior hits terminate traversal exactly like opaque
    geometry, so this config measures the engine on realistic foliage
    while bench_foliage_pt keeps the adversarial floor honest."""
    from steeljax.scene.builtin import make_foliage_scene
    _bench_pt(make_foliage_scene(cards=500_000, serrated=False),
              "foliage_solid_pt_rays_per_second")


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

    sample = np.asarray(image[:: max(image.shape[0] // 64, 1)])
    assert np.isfinite(sample).all(), "non-finite pixels in hybrid frame"
    assert float(sample.std()) > 0.0, "constant hybrid frame"
    _emit("hybrid_1080p_ms_per_frame", ms, "ms/frame", 33.33 / ms)


def bench_kernel_parity() -> None:
    """Regenerate the on-chip kernel-parity artifact as part of every
    bench capture (self-renewing gate: a kernel regression fails the
    bench run instead of shipping behind a stale-green artifact)."""
    from steeljax.apps.kernel_parity import run

    results = run()
    n_ok = sum(1 for v in results["variants"].values() if v.get("ok"))
    with open("docs/kernel_parity.json", "w") as f:
        json.dump(results, f, indent=1)
    _emit("kernel_parity_variants_ok", float(n_ok), "variants",
          n_ok / max(len(results["variants"]), 1))
    if not results["all_ok"]:
        raise SystemExit(1)


CONFIGS = {
    "stress": "bench_stress_pt",
    "stress_tex": "bench_stress_tex_pt",
    "foliage": "bench_foliage_pt",
    "foliage_solid": "bench_foliage_solid_pt",
    "hybrid": "bench_hybrid_1080p",
    "parity": "bench_kernel_parity",
    "cornell": "bench_cornell_pt",
}


# Per-config wall-cost estimates (seconds) used only for
# budget-skipping decisions; measured warm-cache in the round-5 final
# capture (dominated by scene prep + the host->TPU tunnel upload, not
# the timed frames — foliage ships ~90 MB of tables at ~1 MB/s).
_EST_S = {
    "cornell": 90,
    "parity": 420,
    "hybrid": 240,
    "foliage": 840,
    "foliage_solid": 540,
    "stress": 480,
    "stress_tex": 480,
}

# Priority order under a wall-clock budget: headline first (its capture
# must never be lost again — round 4's driver run timed out with the
# headline still queued), then the correctness gate, then the round's
# active perf configs; the slow multi-M-triangle stress sweeps go last
# and are the first to be budget-skipped.
_ORDER = ("cornell", "parity", "hybrid", "foliage", "foliage_solid",
          "stress", "stress_tex")


def main() -> None:
    import subprocess
    import sys

    if len(sys.argv) > 1:
        globals()[CONFIGS[sys.argv[1]]]()
        return

    # Each config runs in its own process: a heavy config must not
    # degrade or crash the ones after it (measured: running the 1.5M-tri
    # stress config in-process slowed the following Cornell run 3x).
    #
    # The whole run fits a wall-clock budget (STEELJAX_BENCH_BUDGET_S,
    # default 1500 s): configs that no longer fit emit a
    # {"metric": ..., "skipped": true} line instead of running, so a
    # budget-limited capture is still a COMPLETE record.  The headline
    # (cornell) line is re-emitted as the very last line for single-line
    # parsers, and the run exits 0 unless the headline or the kernel-
    # parity gate failed.
    budget = float(os.environ.get("STEELJAX_BENCH_BUDGET_S", "1500"))
    t_start = time.monotonic()
    rc = 0
    headline_line = None
    for name in _ORDER:
        elapsed = time.monotonic() - t_start
        remaining = budget - elapsed
        est = _EST_S[name]
        if name != "cornell" and est > remaining:
            _emit_skipped(name, "budget")
            continue
        # Bound a hung config so it cannot eat every config after it;
        # the headline config gets whatever remains.
        limit = max(remaining, 60.0) if name == "cornell" \
            else min(remaining, est * 2.5)
        try:
            proc = subprocess.run(
                [sys.executable, __file__, name], check=False,
                capture_output=True, text=True, timeout=limit)
        except subprocess.TimeoutExpired as exc:
            for stream, sink in ((exc.stdout, sys.stdout),
                                 (exc.stderr, sys.stderr)):
                if stream:
                    if isinstance(stream, bytes):
                        stream = stream.decode("utf-8", "replace")
                    sink.write(stream)
                    sink.flush()
            _emit_skipped(name, "timeout")
            if name in ("parity", "cornell"):
                rc = 1
            continue
        sys.stderr.write(proc.stderr)
        sys.stderr.flush()
        sys.stdout.write(proc.stdout)
        sys.stdout.flush()
        if name == "cornell":
            lines = [ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                headline_line = lines[-1]
        if proc.returncode != 0 and name in ("parity", "cornell"):
            rc = proc.returncode
    if headline_line is not None:
        print(headline_line, flush=True)
    if rc:
        raise SystemExit(rc)


def _emit_skipped(name: str, reason: str) -> None:
    print(json.dumps({"metric": name, "skipped": True, "reason": reason}),
          flush=True)


if __name__ == "__main__":
    main()
