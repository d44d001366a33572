"""PathTracingRenderer: accumulation state + frame step around the
integrator.

The analog of Source/Engine/Render/PathTracingRenderer.{hpp,cpp}: owns the
R32G32B32A32 accumulation image as an explicit JAX array (which makes
checkpointing trivial — SURVEY.md §5), resets it on camera/scene/resize
events (PathTracingRenderer.cpp:146-170, 293-311, 346-349), and applies the
filmic tone map for display output (RayGen.rgen:420-424).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from steeljax.accel.bvh import apply_permutation
from steeljax.accel.dispatch import TraceTables, prepare_tables
from steeljax.core import camera as camera_lib
from steeljax.core.colors import tone_map
from steeljax.core.config import RenderConfig
from steeljax.env.panorama import panorama_to_cube
from steeljax.io import image as image_io
from steeljax.render.pt.integrator import render_sample
from steeljax.scene.flatten import FlatScene, flatten_scene
from steeljax.scene.scene import Scene


@struct.dataclass
class AccumulationState:
    accumulated: jnp.ndarray  # (H, W, 3) float32 running mean
    index: jnp.ndarray        # () int32 — samples accumulated so far


def init_accumulation(width: int, height: int) -> AccumulationState:
    return AccumulationState(
        accumulated=jnp.zeros((height, width, 3), jnp.float32),
        index=jnp.zeros((), jnp.int32))


def accumulate(state: AccumulationState,
               result: jnp.ndarray) -> AccumulationState:
    """Running mean (AccumulateResult, RayGen.rgen:307-320)."""
    idx = state.index.astype(jnp.float32)
    merged = (result + idx * state.accumulated) / (idx + 1.0)
    return AccumulationState(accumulated=merged, index=state.index + 1)


def prepare_scene(scene: Scene, env_resolution: int = 256,
                  use_default_environment: bool = True,
                  use_pallas: bool | None = None,
                  leaf_size: int | None = None,
                  accel=None) -> tuple[FlatScene, TraceTables]:
    """Flatten + build acceleration structure + environment cubemap.

    Scenes without a loadable panorama get the procedural sky when
    `use_default_environment` (Config::kUseDefaultAssets analog).

    Passing an accel.instances.InstancedAccel as `accel` selects the
    two-level structure: per-primitive BLAS (cached inside `accel`) + an
    instance TLAS, so later `accel.prepare(scene)` calls re-prepare in
    O(instances) (AccelerationStructureManager.cpp:128-220 semantics)."""
    env_cube = None
    env_analytic = False
    if getattr(scene, "environment_cube", None) is not None:
        # Direct cubemap injection (e.g. the fitted golden-surrogate env,
        # apps.fit_env_surrogate) — bypasses panorama loading.
        env_cube = np.asarray(scene.environment_cube, np.float32)
    elif getattr(scene, "environment_color", None) is not None:
        env_cube = np.broadcast_to(
            np.asarray(scene.environment_color, np.float32),
            (6, env_resolution, env_resolution, 3)).copy()
    elif scene.environment_path and Path(scene.environment_path).exists():
        panorama = image_io.load_hdr(scene.environment_path)
        env_cube = np.asarray(panorama_to_cube(panorama, env_resolution))
    elif use_default_environment:
        from steeljax.env.sky import procedural_sky_cube
        env_cube = procedural_sky_cube(env_resolution)
        env_analytic = True
    flat = flatten_scene(scene, env_cube, env_analytic=env_analytic)

    if accel is not None:
        return flat, accel.prepare(scene)

    tri_pos = np.asarray(flat.tri_pos)
    # Conservative per-triangle alpha-coverage masks baked into the
    # triangle records (accel.alphamask): traversal rejects provably-
    # transparent alpha-test hits in-kernel — the reference's any-hit
    # shader (AnyHit.rahit:25-52) — leaving the integrator's exact
    # bounded re-trace only the boundary cells.
    tri_alpha_mask = None
    tri_fine_mask = None
    if flat.any_alpha_test:
        from steeljax.accel.alphamask import (compute_alpha_masks,
                                              compute_fine_masks)
        mask_args = (
            np.asarray(flat.tri_uv), np.asarray(flat.tri_mat),
            np.asarray(flat.mat_base_color), np.asarray(flat.mat_params),
            np.asarray(flat.mat_tex), np.asarray(flat.mat_flags),
            scene.textures)
        tri_alpha_mask = compute_alpha_masks(*mask_args)
        # Two-plane fine rows for the multi-hit kernel (STEELJAX_FINEMASK=0
        # reverts to aux-lane-only masking for A/B).
        if os.environ.get("STEELJAX_FINEMASK", "1") == "1":
            tri_fine_mask = compute_fine_masks(*mask_args)
    if leaf_size is None:
        env_leaf = os.environ.get("STEELJAX_LEAF_SIZE")
        if env_leaf is not None:
            leaf_size = int(env_leaf)
        else:
            # Scene-size-dependent default (round-5 sweep under all-axis
            # trees): small scenes are pop-bound and bigger leaves pay
            # (cornell leaf48 32.1 vs 28.5 Mray/s at 24, +12.6%; on-chip
            # kernel equality validated at leaf48); mid/large scenes
            # measured washes (hybrid 76.6 vs 76.3 ms, stress 0.771 vs
            # 0.781 Mray/s), so they keep 24.
            leaf_size = 48 if len(tri_pos) <= 50_000 else 24
    tables, global_order, total_padded = prepare_tables(
        tri_pos, np.asarray(flat.tri_double_sided), leaf_size=leaf_size,
        use_pallas=use_pallas, tri_alpha_mask=tri_alpha_mask,
        tri_fine_mask=tri_fine_mask)
    permuted = apply_permutation((None, global_order, total_padded), {
        "tri_pos": tri_pos,
        "tri_nrm": np.asarray(flat.tri_nrm),
        "tri_tan": np.asarray(flat.tri_tan),
        "tri_uv": np.asarray(flat.tri_uv),
        "tri_mat": np.asarray(flat.tri_mat),
        "tri_double_sided": np.asarray(flat.tri_double_sided),
        "tri_shade": np.asarray(flat.tri_shade),
    })
    # Fused trace+shade kernel tables (TPU): the kernel emits interpolated
    # shading attributes, killing the per-bounce tri_shade row gather
    # (~12 ns/index on TPU).  Alpha-test scenes keep the gather path (the
    # bounded any-hit re-trace reads full rows).
    if not flat.any_alpha_test:
        from steeljax.accel.dispatch import attach_shade_tables
        tables = attach_shade_tables(
            tables, permuted["tri_nrm"], permuted["tri_tan"],
            permuted["tri_uv"], permuted["tri_mat"],
            textured=flat.has_textures,
            tri_uvd=permuted["tri_shade"][:, 27])
    # Promote to DEVICE exactly the per-triangle arrays this path gathers
    # (the rest stay host numpy — jit prunes unused args, so they are
    # never shipped through the ~1 MB/s axon tunnel).  The Pallas kernels
    # read only their packed VMEM tables; tri_shade row gathers still run
    # when fused shading is off or alpha materials force row reads.
    needs_rows = (not tables.use_pallas) or tables.shade_mode == 0 \
        or flat.any_alpha_test or flat.any_alpha_blend
    dev = jnp.asarray if not tables.use_pallas else (lambda x: x)
    flat = flat.replace(
        tri_pos=dev(permuted["tri_pos"]),
        tri_nrm=dev(permuted["tri_nrm"]),
        tri_tan=dev(permuted["tri_tan"]),
        tri_uv=dev(permuted["tri_uv"]),
        tri_mat=dev(permuted["tri_mat"]),
        tri_double_sided=dev(permuted["tri_double_sided"]),
        tri_shade=(jnp.asarray(permuted["tri_shade"]) if needs_rows
                   else permuted["tri_shade"]),
    )
    # Structural validation (the validation-layers analog): opt-in via
    # STEELJAX_VALIDATE=1; always on in the test suite (core.validate).
    from steeljax.core import validate as validate_lib
    if validate_lib.validation_enabled():
        validate_lib.validate_flat_scene(flat)
        validate_lib.validate_tables(tables, int(flat.tri_pos.shape[0]))
    return flat, tables


class PathTracingRenderer:
    """Host-side driver: owns device scene arrays and accumulation state."""

    def __init__(self, scene: Scene, width: int, height: int,
                 config: RenderConfig = RenderConfig(), prepared=None,
                 instancing: bool = False):
        self.scene = scene
        self.width = width
        self.height = height
        self.config = config
        self._accel = None
        if instancing and prepared is None:
            from steeljax.accel.instances import InstancedAccel
            self._accel = InstancedAccel()
        self.flat, self.tables = prepared or prepare_scene(
            scene, accel=self._accel)
        self.state = init_accumulation(width, height)
        self._set_camera_arrays()

    def refresh_scene(self, prepared=None) -> None:
        """Refresh device tables after scene mutation (the per-frame TLAS
        rebuild of SceneRenderer.cpp:179-218, done on demand) and reset
        accumulation.  With instancing, only the O(instances) instance
        tables and the light rows rebuild — BLAS and triangle tables stay
        resident on device."""
        if prepared is not None:
            self.flat, self.tables = prepared
        elif self._accel is not None:
            from steeljax.scene.flatten import refresh_lights
            self.tables = self._accel.prepare(self.scene)
            self.flat = refresh_lights(self.flat, self.scene)
        else:
            self.flat, self.tables = prepare_scene(self.scene)
        self.reset_accumulation()

    def _set_camera_arrays(self) -> None:
        projection = dataclasses.replace(
            self.scene.camera_projection)
        frame = camera_lib.make_frame(
            self.scene.camera_location, projection,
            reverse_depth=self.config.reverse_depth)
        self.inverse_view = jnp.asarray(frame.inverse_view)
        self.inverse_proj = jnp.asarray(frame.inverse_proj)
        self.camera_near = frame.camera_near
        self.camera_far = frame.camera_far

    def reset_accumulation(self) -> None:
        """eCameraUpdate / resize / scene-register reset
        (PathTracingRenderer.cpp:346-349)."""
        self.state = init_accumulation(self.width, self.height)

    def resize(self, width: int, height: int) -> None:
        """Swapchain-recreate analog (PathTracingRenderer::Resize,
        PathTracingRenderer.cpp:293-311): new render/accumulation extent,
        accumulation restarts.  The next frame recompiles for the new
        shape — the pipeline-recreate cost the reference pays too."""
        self.width = width
        self.height = height
        self.reset_accumulation()

    def set_camera(self, location=None, projection=None) -> None:
        if location is not None:
            self.scene.camera_location = location
        if projection is not None:
            self.scene.camera_projection = projection
        self._set_camera_arrays()
        self.reset_accumulation()

    def render_frame(self) -> np.ndarray:
        """One 1-spp frame folded into the accumulator; returns the
        tone-mapped display image (H, W, 3) float in [0, 1]."""
        result = render_sample(
            self.flat, self.tables, self.inverse_view, self.inverse_proj,
            self.camera_near, self.camera_far, self.width, self.height,
            accumulation_index=self.state.index, sample_index=0,
            config=self.config)
        if self.config.accumulation:
            self.state = accumulate(self.state, result)
            shown = self.state.accumulated
        else:
            shown = result
        if self.config.render_to_hdr:
            return np.asarray(shown)
        return np.asarray(tone_map(shown))

    def render(self, spp: int) -> np.ndarray:
        """Accumulate `spp` frames and return the final display image."""
        image = None
        for _ in range(spp):
            image = self.render_frame()
        return image
