"""SceneRenderer: top-level render coordinator with runtime mode switch.

The analog of Source/Engine/Render/SceneRenderer.{hpp,cpp}: owns both the
hybrid and path-tracing renderers over one prepared scene, dispatches per
frame by mode, and implements the reference's `T`-key toggle
(SceneRenderer.cpp:375-397) — switching into path tracing resets the
accumulation like the eCameraUpdate handler does.
"""

from __future__ import annotations

import enum

import numpy as np

from steeljax.core.config import RenderConfig
from steeljax.env.environment import Environment, load_environment
from steeljax.render.hybrid.renderer import HybridRenderer
from steeljax.render.pt.renderer import PathTracingRenderer, prepare_scene
from steeljax.scene.scene import Scene


class RenderMode(enum.Enum):
    """EngineHelpers.hpp kRenderModeCount=2."""
    PATH_TRACING = 0
    HYBRID = 1


class SceneRenderer:
    def __init__(self, scene: Scene, width: int, height: int,
                 config: RenderConfig = RenderConfig(),
                 environment: Environment | None = None,
                 mode: RenderMode | None = None):
        self.scene = scene
        self.width = width
        self.height = height
        self.config = config
        self.mode = mode or (RenderMode.PATH_TRACING
                             if config.path_tracing_enabled
                             else RenderMode.HYBRID)

        flat, tables = prepare_scene(scene)
        env = environment or load_environment(
            panorama_path=scene.environment_path)

        self.path_tracer = PathTracingRenderer.__new__(PathTracingRenderer)
        self.path_tracer.scene = scene
        self.path_tracer.width = width
        self.path_tracer.height = height
        self.path_tracer.config = config
        self.path_tracer.flat = flat
        self.path_tracer.tables = tables
        from steeljax.render.pt.renderer import init_accumulation
        self.path_tracer.state = init_accumulation(width, height)
        self.path_tracer._set_camera_arrays()

        self.hybrid = HybridRenderer.__new__(HybridRenderer)
        self.hybrid.scene = scene
        self.hybrid.width = width
        self.hybrid.height = height
        self.hybrid.config = config
        self.hybrid.flat = flat
        self.hybrid.tables = tables
        self.hybrid.env = env
        self.hybrid.light_volume = None
        import steeljax.core.camera as camera_lib
        self.hybrid.frame = camera_lib.make_frame(
            scene.camera_location, scene.camera_projection,
            reverse_depth=config.reverse_depth)

    def toggle_render_mode(self) -> RenderMode:
        """The `T` key (SceneRenderer.cpp:375-388): flips mode and resets
        path-tracing accumulation on entry."""
        if self.mode is RenderMode.PATH_TRACING:
            self.mode = RenderMode.HYBRID
        else:
            self.mode = RenderMode.PATH_TRACING
            self.path_tracer.reset_accumulation()
        return self.mode

    def render_frame(self) -> np.ndarray:
        if self.mode is RenderMode.PATH_TRACING:
            return self.path_tracer.render_frame()
        return self.hybrid.render_frame()
