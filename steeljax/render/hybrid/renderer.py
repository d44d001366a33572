"""HybridRenderer: G-buffer -> deferred lighting -> forward composite.

The stage composition of Source/Engine/Render/Private/HybridRenderer.cpp:
79-91 (GBufferStage -> LightingStage -> ForwardStage) as one jitted frame
function.  Unlike the path tracer there is no accumulation: the hybrid
frame is deterministic (the reference's real-time mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.env.environment import Environment, load_environment
from steeljax.render.hybrid.forward import forward_stage
from steeljax.render.hybrid.gbuffer import generate_gbuffer
from steeljax.render.hybrid.lighting import deferred_lighting
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.scene import Scene


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "ray_tracing_enabled",
                     "force_forward", "max_blend_layers", "debug_view",
                     "override_material", "tile"))
def render_hybrid_pixels(scene, tables, env: Environment,
                         inverse_view, inverse_proj, view_proj,
                         camera_near, camera_far, width: int, height: int,
                         px, py, light_volume=None,
                         ray_tracing_enabled: bool = True,
                         force_forward: bool = False,
                         max_blend_layers: int = 4,
                         debug_view: str | None = None,
                         override_material: tuple | None = None,
                         raster_scene=None, tile=None):
    """One hybrid frame for the pixels (px, py); returns (N, 3) display
    color in [0, 1] (tone-mapped)."""
    xs = px.astype(jnp.float32)
    ys = py.astype(jnp.float32)
    # Pixel-center rays (the rasterizer's fragment positions) — no jitter.
    u = (xs + 0.5) / width
    v = (ys + 0.5) / height
    xy = jnp.stack([u, v], axis=-1) * 2.0 - 1.0
    target = jnp.einsum("ij,nj->ni", inverse_proj,
                        jnp.concatenate([xy, jnp.ones_like(xy)], -1))
    direction = target[..., :3] / jnp.linalg.norm(
        target[..., :3], axis=-1, keepdims=True)
    direction = jnp.einsum(
        "ij,nj->ni", inverse_view,
        jnp.concatenate([direction, jnp.zeros_like(direction[..., :1])],
                        -1))[..., :3]
    direction = direction / jnp.linalg.norm(direction, axis=-1,
                                            keepdims=True)
    origin = jnp.broadcast_to(inverse_view[:3, 3], direction.shape)
    camera_position = inverse_view[:3, 3]

    # Vertical pixel spread = 2*tan(fovy/2)/H, recovered from the
    # projection: inverse_proj[1][1] = tan(fovy/2) (with the Vulkan flip).
    pixel_spread = 2.0 * jnp.abs(inverse_proj[1, 1]) / height
    if force_forward:
        # kForceForward (Config.hpp:41): the G-buffer predicate excludes
        # every material (GBufferStage.cpp:147-157), so the G-buffer and
        # lighting stages are statically dropped and the forward stage
        # draws everything at fragment rate.
        n = direction.shape[0]
        gbuffer = {"hit": jnp.zeros((n,), bool)}
        lit = jnp.zeros((n, 3), jnp.float32)
        opaque_t = jnp.full((n,), 1000.0, jnp.float32)
    else:
        # named_scope = the EASY_BLOCK stage markers (SURVEY.md §5): each
        # stage shows up as a labeled span in jax.profiler traces.
        # Rasterized primary visibility (the reference's raster G-buffer
        # pipeline) engages only when the caller passes the device raster
        # inputs AND confirms (px, py) is the canonical full-frame
        # tiled_order layout via `tile` — sharded/partial pixel batches
        # keep the traced path.
        raster = None
        if raster_scene is not None and tile is not None:
            raster = (raster_scene, width, height, tile)
        with jax.named_scope("gbuffer_stage"):
            gbuffer = generate_gbuffer(scene, tables, origin, direction,
                                       camera_near, camera_far, view_proj,
                                       camera_position,
                                       pixel_spread=pixel_spread,
                                       raster=raster)

        inverse_proj_view = jnp.einsum(
            "ij,jk->ik", inverse_view, inverse_proj)
        uv = jnp.stack([u, v], axis=-1)
        # G-buffer channel debug views short-circuit before lighting
        # (Common/Debug.glsl channel toggles; see RenderConfig.debug_view).
        if debug_view in ("normals", "albedo", "roughness", "metallic",
                          "occlusion", "emission", "depth"):
            from steeljax.core.colors import tone_map
            bco = gbuffer["base_color_occlusion"]
            rm = gbuffer["rough_metal"]
            channel = {
                "normals": gbuffer["normal"],
                "albedo": bco[..., :3],
                "roughness": jnp.repeat(rm[..., 0:1], 3, axis=-1),
                "metallic": jnp.repeat(rm[..., 1:2], 3, axis=-1),
                "occlusion": jnp.repeat(bco[..., 3:4], 3, axis=-1),
                "emission": tone_map(gbuffer["emission"]),
                "depth": jnp.repeat(gbuffer["depth"][..., None] * 50.0,
                                    3, axis=-1),
            }[debug_view]
            return jnp.clip(channel, 0.0, 1.0)

        with jax.named_scope("lighting_stage"):
            lit = deferred_lighting(scene, tables, env, gbuffer, uv,
                                    inverse_proj_view, camera_position,
                                    light_volume=light_volume,
                                    ray_tracing_enabled=ray_tracing_enabled,
                                    debug_view=debug_view,
                                    override_material=override_material)
        if debug_view in ("direct", "indirect"):
            from steeljax.core.colors import tone_map
            return tone_map(lit)

        # Opaque hit distance for the blend-stage depth test, reconstructed
        # from the stored depth exactly like the raster pipeline would
        # z-test.
        from steeljax.render.hybrid.lighting import restore_position
        position = restore_position(gbuffer["depth"], uv, inverse_proj_view)
        opaque_t = jnp.linalg.norm(position - origin, axis=-1)

    with jax.named_scope("forward_stage"):
        return forward_stage(scene, tables, env, lit, gbuffer, origin,
                             direction, opaque_t, camera_near,
                             camera_position, ray_tracing_enabled,
                             max_blend_layers=max_blend_layers,
                             all_materials=force_forward,
                             override_material=override_material)


class HybridRenderer:
    """Host-side driver mirroring HybridRenderer.cpp stage composition."""

    def __init__(self, scene: Scene, width: int, height: int,
                 config: RenderConfig = RenderConfig(),
                 environment: Environment | None = None, prepared=None):
        self.scene = scene
        self.width = width
        self.height = height
        self.config = config
        self.flat, self.tables = prepared or prepare_scene(scene)
        env_color = getattr(scene, "environment_color", None)
        env_cube = None
        if env_color is not None:
            import numpy as np
            env_cube = np.broadcast_to(
                np.asarray(env_color, np.float32), (6, 64, 64, 3)).copy()
        self.env = environment or load_environment(
            panorama_path=scene.environment_path, cube=env_cube)
        self.light_volume = None
        frame = camera_lib.make_frame(scene.camera_location,
                                      scene.camera_projection,
                                      reverse_depth=config.reverse_depth)
        self.frame = frame
        self.raster_scene = self._prepare_raster()
        if config.global_illumination_enabled:
            self.bake_light_volume()

    def _prepare_raster(self):
        """Device raster inputs for the rasterized G-buffer, or None
        (the default) when the traced path is kept.

        OPT-IN (STEELJAX_RASTER=1): measured on-chip, the tile-binned
        raster LOSES to the packet-traced primary pass at 1080p on the
        220k-tri bench scene (~310 ms visibility vs 64 ms traced incl.
        fused shading): the BVH's ordered descent prunes occluded
        geometry logarithmically while the raster pays linear local
        density, and XLA's while-loop slices cannot pipeline their HBM
        window reads (~23 us/slice fixed latency).  Full ablation in
        ARCHITECTURE.md "Rasterized G-buffer".  Kept as the parity
        analog of the reference's raster pipeline and for
        CPU-oracle-tested exactness."""
        import os

        from steeljax.render.hybrid.raster import prepare_raster, supported
        if os.environ.get("STEELJAX_RASTER", "0") != "1":
            return None
        if not supported(self.width, self.height):
            return None
        if self.scene.camera_projection.y_fov == 0.0:
            return None  # orthographic: w_clip carries no eye depth
        if not self.config.reverse_depth:
            return None  # raster z test assumes reverse-z NDC
        return prepare_raster(self.flat, self.tables)

    def refresh_scene(self, prepared=None) -> None:
        from steeljax.render.pt.renderer import prepare_scene as prep
        self.flat, self.tables = prepared or prep(self.scene)
        self.frame = camera_lib.make_frame(
            self.scene.camera_location, self.scene.camera_projection,
            reverse_depth=self.config.reverse_depth)
        self.raster_scene = self._prepare_raster()

    def bake_light_volume(self, spp: int = 8, **kwargs) -> None:
        """Run the light-volume GI bake (GlobalIllumination::
        GenerateLightVolume) and enable LIGHT_VOLUME_ENABLED sampling."""
        from steeljax.gi import generate_light_volume
        self.light_volume = generate_light_volume(
            self.flat, self.tables, spp=spp, **kwargs)

    def render_frame_device(self) -> jnp.ndarray:
        """One hybrid frame, left on device as (H*W, 3) in row-major pixel
        order.  The benchmarking surface: the reference's frame ends at
        the swapchain image, not at a host download (the axon tunnel's
        host transfer would otherwise dominate the measurement)."""
        from steeljax.render.pt.integrator import detile, tiled_order

        tiled = tiled_order(self.width, self.height)
        if tiled is not None:
            px, py, tile = tiled
        else:
            ys, xs = np.meshgrid(np.arange(self.height, dtype=np.int32),
                                 np.arange(self.width, dtype=np.int32),
                                 indexing="ij")
            px = jnp.asarray(xs.reshape(-1))
            py = jnp.asarray(ys.reshape(-1))
            tile = None
        out = render_hybrid_pixels(
            self.flat, self.tables, self.env,
            jnp.asarray(self.frame.inverse_view),
            jnp.asarray(self.frame.inverse_proj),
            jnp.asarray(self.frame.view_proj),
            self.frame.camera_near, self.frame.camera_far,
            self.width, self.height, px, py,
            light_volume=self.light_volume,
            ray_tracing_enabled=self.config.ray_tracing_enabled,
            force_forward=self.config.force_forward,
            max_blend_layers=self.config.max_blend_layers,
            debug_view=self.config.debug_view,
            override_material=self.config.override_material,
            raster_scene=getattr(self, "raster_scene", None),
            tile=tile if getattr(self, "raster_scene", None) is not None
            else None)
        if tile is not None:
            out = detile(out, self.width, self.height, tile).reshape(-1, 3)
        return out

    def render_frame(self) -> np.ndarray:
        out = self.render_frame_device()
        return np.asarray(out).reshape(self.height, self.width, 3)
