"""Headless render CLI — the Engine::Run analog (SURVEY.md §7 apps/).

Renders N accumulated frames of a GLTF scene (or the built-in Cornell) and
writes a PNG.  Usage:

    python -m steeljax.apps.render_cli SCENE.gltf -o out.png --spp 64
    python -m steeljax.apps.render_cli builtin:cornell --size 640x360
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("scene", help="GLTF path or builtin:cornell")
    parser.add_argument("-o", "--output", default="render.png")
    parser.add_argument("--size", default="1280x720",
                        help="WIDTHxHEIGHT (default 1280x720)")
    parser.add_argument("--spp", type=int, default=16,
                        help="accumulated samples per pixel")
    parser.add_argument("--mode", choices=["pt", "hybrid"], default="pt")
    parser.add_argument("--gi", action="store_true",
                        help="bake + use the light-volume GI (hybrid mode)")
    parser.add_argument("--show-probes", action="store_true",
                        help="overlay light-volume probe splats on the "
                             "frame (the reference's orphaned LightVolume"
                             "Positions viz, working; implies --gi)")
    parser.add_argument("--gi-spp", type=int, default=8,
                        help="probe-capture samples per pixel")
    parser.add_argument("--gi-min-edge", type=float, default=None,
                        help="octree min cell edge for probe placement "
                             "(GlobalIllumination.cpp:34 default 0.5)")
    parser.add_argument("--gi-resolution", type=int, default=None,
                        help="probe cubemap face resolution (default 32, "
                             "ProbeRenderer.cpp:8-10)")
    parser.add_argument("--hdr", action="store_true",
                        help="skip tone mapping (linear output)")
    parser.add_argument("--env-color", default=None,
                        help="constant environment radiance 'R,G,B' (linear)"
                             " — surrogate for missing panorama assets")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="capture a jax.profiler device trace of the "
                             "render into DIR (view with perfetto / "
                             "tensorboard — the easy_profiler analog)")
    parser.add_argument("--checkpoint", metavar="FILE.npz", default=None,
                        help="pt mode: resume accumulation from FILE if it "
                             "exists and save it at the end — long "
                             "converging renders survive restarts")
    parser.add_argument("--lv-checkpoint", metavar="FILE.npz", default=None,
                        help="gi mode: load the light-volume bake from "
                             "FILE if it exists, else bake and save it")
    parser.add_argument("--instancing", action="store_true",
                        help="two-level acceleration structure (per-"
                             "primitive BLAS + instance TLAS)")
    parser.add_argument("--validate", action="store_true",
                        help="run structural invariant validation on the "
                             "prepared scene/BVH (the validation-layers "
                             "analog, core.validate)")
    parser.add_argument("--overlay", action="store_true",
                        help="burn the frame-time/FPS text into the output "
                             "(the UIRenderer imgui overlay, "
                             "UIRenderer.cpp:108-112)")
    parser.add_argument("--debug-view", default=None,
                        choices=["normals", "albedo", "roughness",
                                 "metallic", "occlusion", "emission",
                                 "depth", "direct", "indirect",
                                 "diffuse", "specular"],
                        help="isolate one G-buffer channel or lighting "
                             "term (Common/PBR.glsl:78-90 / Debug.glsl "
                             "composition switches); diffuse/specular "
                             "(ComposeBRDF isolation) work in BOTH modes, "
                             "the rest are hybrid-only")
    parser.add_argument("--override-material", default=None,
                        metavar="ROUGH,METAL",
                        help="force roughness,metallic after material "
                             "unpack in every shading path "
                             "(DEBUG_OVERRIDE_MATERIAL, Debug.glsl:16-18)")
    parser.add_argument("--force-forward", action="store_true",
                        help="route every material through the forward "
                             "path (Config::kForceForward, Config.hpp:41)")
    parser.add_argument("--sample-count", type=int, default=1,
                        help="sub-samples per accumulated frame (the "
                             "SAMPLE_COUNT shader define, RayGen.rgen)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.validate:
        import os
        os.environ["STEELJAX_VALIDATE"] = "1"

    from steeljax.core.config import RenderConfig
    from steeljax.io.image import write_png
    from steeljax.scene import load_scene
    from steeljax.scene.builtin import make_cornell_scene

    try:
        width, height = (int(v) for v in args.size.split("x"))
    except ValueError:
        parser.error(f"--size must be WIDTHxHEIGHT, got {args.size!r}")

    if args.scene == "builtin:cornell":
        scene = make_cornell_scene()
    else:
        from pathlib import Path
        if not Path(args.scene).exists():
            parser.error(f"scene not found: {args.scene}")
        scene = load_scene(args.scene)

    if args.env_color:
        try:
            scene.environment_color = tuple(
                float(v) for v in args.env_color.split(","))
        except ValueError:
            parser.error(f"--env-color must be R,G,B, got {args.env_color!r}")

    if (args.debug_view and args.mode != "hybrid"
            and args.debug_view not in ("diffuse", "specular")):
        parser.error(f"--debug-view {args.debug_view} requires --mode "
                     "hybrid (only diffuse/specular apply to pt)")
    override = None
    if args.override_material:
        try:
            override = tuple(
                float(v) for v in args.override_material.split(","))
            assert len(override) == 2
        except (ValueError, AssertionError):
            parser.error("--override-material must be ROUGH,METAL, got "
                         f"{args.override_material!r}")
    config = RenderConfig(width=width, height=height,
                          render_to_hdr=args.hdr,
                          sample_count=args.sample_count,
                          force_forward=args.force_forward,
                          debug_view=args.debug_view,
                          override_material=override)

    import contextlib

    from steeljax.core import profiling
    profile_ctx = (profiling.trace(args.profile) if args.profile
                   else contextlib.nullcontext())

    t0 = time.time()
    if args.mode == "pt":
        from steeljax.core.logger import log_i
        from steeljax.render.pt.renderer import PathTracingRenderer
        renderer = PathTracingRenderer(scene, width, height, config,
                                       instancing=args.instancing)
        if args.checkpoint:
            from pathlib import Path

            from steeljax.io import checkpoint as ckpt
            if Path(args.checkpoint).exists():
                state = ckpt.load_accumulation(args.checkpoint)
                if state.accumulated.shape != (height, width, 3):
                    # Resolution changed: accumulation restarts, exactly
                    # like the reference's resize reset.
                    from steeljax.core.logger import log_w
                    log_w(f"checkpoint {args.checkpoint} is "
                          f"{state.accumulated.shape[1]}x"
                          f"{state.accumulated.shape[0]}, render is "
                          f"{width}x{height}; starting fresh")
                else:
                    renderer.state = state
                    log_i(f"resumed accumulation at index "
                          f"{int(state.index)} from {args.checkpoint}")
        # Per-frame stats — the UIRenderer frame-time overlay analog
        # ("Frame time: %.2f ms (%.1f FPS)", UIRenderer.cpp:108-112), plus
        # primary-ray throughput.
        image = None
        warm_dt = None
        last = time.time()
        with profile_ctx:
            for i in range(args.spp):
                image = renderer.render_frame()
                now = time.time()
                dt = max(now - last, 1e-9)
                last = now
                # Steady-state frame time for the overlay: the LAST frame
                # (first frames pay jit compiles — 20-60 s cold — which
                # misrepresented FPS when divided out of the wall clock).
                warm_dt = dt
                log_i(f"frame {i + 1}/{args.spp}: {dt * 1000.0:.2f} ms "
                      f"({1.0 / dt:.1f} FPS, "
                      f"{width * height / dt / 1e6:.1f} Mpray/s)")
        if args.checkpoint:
            ckpt.save_accumulation(args.checkpoint, renderer.state)
            log_i(f"saved accumulation index {int(renderer.state.index)} "
                  f"to {args.checkpoint}")
    else:
        from steeljax.render.hybrid.renderer import HybridRenderer
        prepared = None
        if args.instancing:
            from steeljax.accel.instances import InstancedAccel
            from steeljax.render.pt.renderer import prepare_scene
            prepared = prepare_scene(scene, accel=InstancedAccel())
        renderer = HybridRenderer(scene, width, height, config,
                                  prepared=prepared)
        if args.gi or args.show_probes:
            from pathlib import Path

            from steeljax.io import checkpoint as ckpt
            if args.lv_checkpoint and Path(args.lv_checkpoint).exists():
                renderer.light_volume = ckpt.load_light_volume(
                    args.lv_checkpoint)
            else:
                bake_kwargs = {"spp": args.gi_spp}
                if args.gi_min_edge is not None:
                    bake_kwargs["min_edge"] = args.gi_min_edge
                if args.gi_resolution is not None:
                    bake_kwargs["resolution"] = args.gi_resolution
                renderer.bake_light_volume(**bake_kwargs)
                if args.lv_checkpoint:
                    ckpt.save_light_volume(args.lv_checkpoint,
                                           renderer.light_volume)
        with profile_ctx:
            image = renderer.render_frame()
        warm_dt = None
        if args.overlay:
            # Time a warmed second frame for the overlay text (the first
            # pays scene prep + jit compiles; Engine.tick's per-frame
            # timer has the same steady-state semantics).
            t1 = time.time()
            renderer.render_frame()
            warm_dt = max(time.time() - t1, 1e-9)
        if args.show_probes:
            from steeljax.gi.debug import overlay_probes
            image = overlay_probes(image, renderer.light_volume,
                                   renderer.frame.view_proj)
    elapsed = time.time() - t0
    if args.overlay:
        from steeljax.engine.overlay import burn_overlay
        per_frame = warm_dt if warm_dt is not None else elapsed
        image = burn_overlay(image, [
            f"Frame time: {per_frame * 1e3:.2f} ms "
            f"({1.0 / max(per_frame, 1e-9):.1f} FPS)"])
    print(f"rendered {args.mode} {width}x{height} spp={args.spp} "
          f"in {elapsed:.1f}s", file=sys.stderr)

    write_png(args.output, image)
    print(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
