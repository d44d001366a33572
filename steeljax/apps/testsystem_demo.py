"""Headless TestSystem timeline demo — the reference's scripted scenario
run end-to-end (Systems/Private/TestSystem.cpp:8-74).

Loads the reference CornellBox (whose GLTF declares the `damaged_helmet`
prefab and a `damaged_helmet_spawn` node), drives the Engine on a virtual
clock with the TestSystem, and writes one frame after each timeline event:

    t >  8 s  helmet prefab instanced at the spawn point
    t > 12 s  prefab erased + orange point light added
    t > 14 s  prefab re-merged and instanced again, light removed
    t > 18 s  prefab removed + cyan point light

Runs with the two-level instanced acceleration structure, so every edit
re-prepares in O(instances) (the per-frame BuildTlas analog) instead of a
full reflatten + SAH rebuild.

    python -m steeljax.apps.testsystem_demo --size 320x180 -o docs/gallery
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REFERENCE_SCENE = "/root/reference/Assets/Scenes/CornellBox/CornellBox.gltf"
REFERENCE_PREFAB = (
    "/root/reference/Assets/Scenes/DamagedHelmet/DamagedHelmet.gltf")
# One frame after each TestSystem event edge (+ one "before" frame).
CAPTURE_TIMES = (7.0, 9.0, 13.0, 15.0, 19.0)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("scene", nargs="?", default=REFERENCE_SCENE)
    parser.add_argument("--prefab", default=REFERENCE_PREFAB,
                        help="prefab GLTF for the t>14s re-merge")
    parser.add_argument("-o", "--out-dir", default=".")
    parser.add_argument("--size", default="320x180")
    parser.add_argument("--mode", choices=["pt", "hybrid"],
                        default="hybrid")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from steeljax.core.config import RenderConfig
    from steeljax.core.logger import log_i
    from steeljax.engine import Engine, TestSystem
    from steeljax.io.image import write_png
    from steeljax.scene import load_scene

    width, height = (int(v) for v in args.size.split("x"))
    scene = load_scene(args.scene)
    prefab_path = args.prefab

    engine = Engine(scene, width, height,
                    RenderConfig(width=width, height=height),
                    instancing=True)
    engine.add_system(TestSystem(
        prefab_loader=lambda: load_scene(prefab_path)))
    if args.mode == "hybrid":
        engine.inject_key("t")  # the reference's mode-toggle key

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    wrote = []
    t0 = time.time()
    for target in CAPTURE_TIMES:
        while engine.global_time < target:
            frame = engine.tick(1.0)
        path = out_dir / f"testsystem_t{int(target):02d}s.png"
        write_png(str(path), frame)
        for line in engine.overlay_lines():
            log_i(f"t={engine.global_time:.0f}s  {line}")
        log_i(f"t={engine.global_time:.0f}s  entities="
              f"{len(scene.renderable_entities())} "
              f"lights={scene.gather_lights()[0].shape[0]} -> {path}")
        wrote.append(str(path))
    print(f"timeline rendered in {time.time() - t0:.1f}s", file=sys.stderr)
    for path in wrote:
        print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
