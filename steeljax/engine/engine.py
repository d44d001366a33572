"""Engine: headless orchestrator (Engine::Create/Run/Destroy analog).

The reference's main loop (Private/Engine.cpp:68-99) polls the window,
ticks systems, and draws through the frame loop; steeljax's loop advances a
virtual clock, processes injected events + systems, re-flattens the scene
when its revision advanced (the every-frame TLAS rebuild, done on demand),
and renders frames to arrays.  Keyboard semantics carried over: `T`
toggles render mode, `R` reloads the active pipeline (per-renderer cache drop).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable

import numpy as np

from steeljax.core.config import RenderConfig
from steeljax.engine.events import EventBus, EventType, KeyInput
from steeljax.engine.systems import System
from steeljax.render.scene_renderer import SceneRenderer
from steeljax.scene.scene import Scene


class Engine:
    def __init__(self, scene: Scene | str | Path,
                 width: int | None = None, height: int | None = None,
                 config: RenderConfig = RenderConfig(), environment=None,
                 instancing: bool = False, overlay: bool = False):
        if not isinstance(scene, Scene):
            from steeljax.scene import load_scene
            scene = load_scene(scene)
        self.scene = scene
        self.config = config
        self.width = width or config.width
        self.height = height or config.height

        self.bus = EventBus()
        self.systems: list[System] = []
        # instancing=True keeps per-primitive BLAS resident and rebuilds
        # only the instance TLAS on scene revisions — the right choice for
        # TestSystem-style dynamic scenes (transform edits re-prepare in
        # O(instances) with no shape change, so no frame recompile).
        self.renderer = SceneRenderer(scene, self.width, self.height, config,
                                      environment=environment,
                                      instancing=instancing)
        self._scene_revision = scene.revision
        self.global_time = 0.0
        self.frame_index = 0
        self.draw_suspended = False   # minimized-window analog
        self._last_frame = np.zeros((self.height, self.width, 3),
                                    np.float32)

        self.bus.add_handler(EventType.CAMERA_UPDATE,
                             lambda _: self.renderer.update_camera())
        self.bus.add_handler(EventType.KEY_INPUT, self._on_key)
        self.bus.add_handler(EventType.RESIZE, self._on_resize)

        # UIRenderer analog (UIRenderer.cpp:106-125): an overlay text-
        # binding list evaluated per frame.  With overlay=True the lines
        # are BURNED into every returned frame with the built-in bitmap
        # font (engine.overlay) — the composited imgui pass; off, the
        # host decides what to do with the lines (render_cli logs them).
        # The default binding mirrors the reference's frame time / FPS.
        self.overlay = overlay
        self.last_frame_seconds = 0.0
        self.text_bindings: list[Callable[[], str]] = [
            lambda: (f"Frame time: {self.last_frame_seconds * 1e3:.2f} ms "
                     f"({1.0 / max(self.last_frame_seconds, 1e-9):.1f} FPS)")
        ]

    def add_text_binding(self, binding: Callable[[], str]) -> None:
        """UIRenderer::BindText analog: register an overlay line."""
        self.text_bindings.append(binding)

    def overlay_lines(self) -> list[str]:
        """Evaluate the overlay text bindings for the current frame."""
        return [binding() for binding in self.text_bindings]

    # ---- input ----------------------------------------------------------

    def _on_key(self, event: KeyInput) -> None:
        if event.action != "press":
            return
        if event.key == "t":
            self.renderer.toggle_render_mode()
        elif event.key == "r":
            # Per-pipeline shader reload: only the active renderer's
            # executables drop (HybridRenderer.cpp:117-129).
            self.renderer.reload_pipelines()

    def _on_resize(self, extent) -> None:
        """eResize (Engine.cpp:135-149): zero-area extents suspend drawing
        (window minimized); otherwise both renderers adopt the new extent
        and the camera aspect follows (CameraSystem resize analog)."""
        width, height = extent
        self.draw_suspended = width == 0 or height == 0
        if self.draw_suspended:
            return
        self.width = width
        self.height = height
        self.renderer.resize(width, height)
        proj = self.scene.camera_projection
        if proj is not None and proj.height:
            import dataclasses
            self.scene.camera_projection = dataclasses.replace(
                proj, width=proj.height * (width / height))
            self.renderer.update_camera()

    def inject_key(self, key: str, action: str = "press") -> None:
        self.bus.trigger(EventType.KEY_INPUT, KeyInput(key, action))

    def inject_resize(self, width: int, height: int) -> None:
        self.bus.trigger(EventType.RESIZE, (width, height))

    def inject_mouse_move(self, x: float, y: float) -> None:
        self.bus.trigger(EventType.MOUSE_MOVE, (x, y))

    # ---- systems --------------------------------------------------------

    def add_system(self, system: System) -> None:
        self.systems.append(system)

    # ---- loop -----------------------------------------------------------

    def tick(self, delta_seconds: float) -> np.ndarray:
        """One iteration of Engine::Run's loop body; returns the frame."""
        self.global_time += delta_seconds
        for system in self.systems:
            system.process(self.scene, delta_seconds)
        if self.scene.revision != self._scene_revision:
            self.renderer.refresh_scene()
            self._scene_revision = self.scene.revision
        if self.draw_suspended:
            # Minimized: systems tick, drawing suspends (Engine.cpp:88-91).
            return self._last_frame
        start = time.perf_counter()
        frame = self.renderer.render_frame()
        self.last_frame_seconds = time.perf_counter() - start
        self.frame_index += 1
        if self.overlay:
            from steeljax.engine.overlay import burn_overlay
            frame = burn_overlay(frame, self.overlay_lines())
        self._last_frame = frame
        return frame

    def run(self, duration_seconds: float, fps: float = 30.0,
            on_frame: Callable[[int, np.ndarray], None] | None = None
            ) -> np.ndarray:
        """Run the loop on a virtual clock; returns the last frame."""
        dt = 1.0 / fps
        steps = max(1, int(round(duration_seconds * fps)))
        frame = None
        for _ in range(steps):
            frame = self.tick(dt)
            if on_frame is not None:
                on_frame(self.frame_index, frame)
        return frame

    def run_realtime(self, duration_seconds: float,
                     on_frame=None) -> np.ndarray:
        """Wall-clock loop (frame time = actual elapsed), for interactive
        hosts feeding events concurrently."""
        start = time.time()
        last = start
        frame = None
        while time.time() - start < duration_seconds:
            now = time.time()
            frame = self.tick(now - last)
            last = now
            if on_frame is not None:
                on_frame(self.frame_index, frame)
        return frame
