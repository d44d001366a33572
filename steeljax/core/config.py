"""Engine configuration as a frozen dataclass.

The reference's compile-time `Config` namespace (Source/Engine/Config.hpp:9-84)
becomes runtime config here; values that were shader `#define`s become jit
constants (closed over at trace time), which is the XLA analog of textual
define overrides (ShaderManager.cpp:11-42).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # Framebuffer (Config.hpp:13).
    width: int = 1280
    height: int = 720

    # Feature toggles (Config.hpp:34-48).
    ray_tracing_enabled: bool = True
    path_tracing_enabled: bool = True
    global_illumination_enabled: bool = False
    reverse_depth: bool = True
    force_forward: bool = False

    # Path-tracer budget (RayGen.rgen:18-26).
    sample_count: int = 1
    min_bounce_count: int = 2
    max_bounce_count: int = 4
    rr_min_threshold: float = 0.05
    max_irradiance: float = 8.0
    accumulation: bool = True
    render_to_hdr: bool = False
    backface_culling: bool = True

    # Alpha-test continuation limit for visibility/material rays; the Vulkan
    # any-hit loop is unbounded (RayGen.rgen:136-170), ours re-traces at most
    # this many times per segment under jit.
    max_alpha_retrace: int = 4

    # Debug composition switch (Common/PBR.glsl:78-90, Common/Debug.glsl):
    # isolate one channel/term of the frame.  One of normals, albedo,
    # roughness, metallic, occlusion, emission, depth, direct, indirect
    # (hybrid G-buffer/lighting channels), diffuse, specular (ComposeBRDF
    # isolation, DEBUG_VIEW_DIFFUSE/SPECULAR — applies to BOTH render
    # modes) — or None for the full composite.
    debug_view: str | None = None

    # DEBUG_OVERRIDE_MATERIAL (Debug.glsl:16-18): force (roughness,
    # metallic) after material unpack in every shading path (RayGen.rgen:
    # 99-102, Lighting.comp:45-48, Forward.frag:46-49), or None.
    override_material: tuple | None = None

    # Forward-stage blend-layer bound: the reference rasterizes every
    # alpha-blend fragment (ForwardStage.cpp:94-104, unsorted); steeljax
    # peels at most this many blend surfaces per pixel and composites them
    # far-to-near (correct order, bounded under jit).
    max_blend_layers: int = 4


DEFAULT_CONFIG = RenderConfig()
