"""Device-mesh pixel sharding for rendering.

Design (SURVEY.md §2.7 / §7): the frame is a flat pixel batch; we lay the
batch out across a 1D `jax.sharding.Mesh` axis ("tiles") with
NamedSharding, replicate the scene + BVH, and jit the integrator.  XLA's
SPMD partitioner then runs each device on its own pixel rows with no
communication — sample accumulation is per-pixel-local (the running mean of
RayGen.rgen:308-319), so the PT pipeline needs zero collectives; a final
all-gather materializes the image only when the host asks for it.

Multi-host meshes over DCN compose the same way (pixel axis first); probe
bakes fan out over the same mesh with probe-face pixels as the batch axis
(gi.light_volume.capture_probes(mesh=...), equality-tested in
tests/test_multidevice.py and exercised by dryrun_multichip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from steeljax.core.config import RenderConfig
from steeljax.render.pt.integrator import render_pixels

PIXEL_AXIS = "tiles"
HOST_AXIS = "hosts"


def make_mesh(devices=None, host_shape: int | None = None) -> Mesh:
    """Device mesh for pixel data-parallelism.

    1D by default (single-host ICI).  With `host_shape=H`, a 2D
    (H, n/H) mesh ("hosts", "tiles"): the outer axis is the DCN
    (multi-host) dimension, the inner the per-host ICI ring.  Pixel
    sharding spans both axes jointly — still pure DP with zero per-frame
    collectives, so DCN bandwidth only matters for the final image
    gather (SURVEY.md §2.7)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if host_shape is None:
        return Mesh(devices, (PIXEL_AXIS,))
    assert devices.size % host_shape == 0
    return Mesh(devices.reshape(host_shape, -1), (HOST_AXIS, PIXEL_AXIS))


def _pixel_spec(mesh: Mesh):
    """PartitionSpec sharding the flat pixel axis over every mesh axis."""
    if HOST_AXIS in mesh.axis_names:
        return P((HOST_AXIS, PIXEL_AXIS))
    return P(PIXEL_AXIS)


def shard_pixels(mesh: Mesh, width: int, height: int):
    """Flat pixel-coordinate arrays laid out across the mesh axes.

    Pads the pixel count to a multiple of the device count; returns
    (px, py, pad) device arrays + the pad amount to strip after render.
    """
    n = mesh.devices.size
    count = width * height
    padded = -(-count // n) * n
    ys, xs = np.meshgrid(np.arange(height, dtype=np.int32),
                         np.arange(width, dtype=np.int32), indexing="ij")
    px = np.zeros(padded, np.int32)
    py = np.zeros(padded, np.int32)
    px[:count] = xs.reshape(-1)
    py[:count] = ys.reshape(-1)
    sharding = NamedSharding(mesh, _pixel_spec(mesh))
    return (jax.device_put(px, sharding), jax.device_put(py, sharding),
            padded - count)


def render_frame_sharded(scene, tables, inverse_view, inverse_proj,
                         camera_near, camera_far, width: int, height: int,
                         mesh: Mesh, accumulation_index=0, sample_index=0,
                         config: RenderConfig = RenderConfig()):
    """Render one sharded frame; returns the (H, W, 3) host image.

    The frame body runs under shard_map (not bare jit+propagation) so the
    big-scene per-bounce ray repack (integrator.repack_rays, a lax.sort
    over the pixel axis) stays DEVICE-LOCAL — under plain jit the SPMD
    partitioner would lower that sort as a cross-device all-to-all every
    bounce, breaking this module's zero-per-frame-collectives design.
    Per-shard repacking is exact: each ray's path is independent of how
    rays are grouped into devices (verified against the single-device
    image in tests/test_multidevice.py)."""
    px, py, pad = shard_pixels(mesh, width, height)
    replicated = NamedSharding(mesh, P())
    scene = jax.device_put(scene, replicated)
    tables = jax.device_put(tables, replicated)
    spec = _pixel_spec(mesh)

    def body(scene, tables, inverse_view, inverse_proj, px, py):
        return render_pixels(
            scene, tables, inverse_view, inverse_proj, camera_near,
            camera_far, width, height, px, py, accumulation_index,
            sample_index, config)

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(P(), P(), P(), P(), spec, spec),
                            out_specs=spec, check_vma=False)
    result = sharded(scene, tables, jnp.asarray(inverse_view),
                     jnp.asarray(inverse_proj), px, py)
    flat = np.asarray(result)
    if pad:
        flat = flat[:-pad]
    return flat.reshape(height, width, 3)


def render_hybrid_frame_sharded(scene, tables, env, inverse_view,
                                inverse_proj, view_proj, camera_near,
                                camera_far, width: int, height: int,
                                mesh: Mesh, light_volume=None,
                                ray_tracing_enabled: bool = True):
    """One sharded HYBRID frame (G-buffer -> deferred -> forward);
    returns the (H, W, 3) host image.

    The hybrid pipeline is even simpler to shard than PT: every stage is
    per-pixel (primary visibility, shadow rays, IBL, composite) with no
    in-flight repack, so plain shard_map over the pixel axis needs zero
    per-frame collectives — the multi-chip analog of tiling
    Lighting.comp's dispatch (LightingStage.cpp:149-157) across GPUs the
    reference never had."""
    from steeljax.render.hybrid.renderer import render_hybrid_pixels

    px, py, pad = shard_pixels(mesh, width, height)
    replicated = NamedSharding(mesh, P())
    scene = jax.device_put(scene, replicated)
    tables = jax.device_put(tables, replicated)
    env = jax.device_put(env, replicated)
    if light_volume is not None:
        light_volume = jax.device_put(light_volume, replicated)
    spec = _pixel_spec(mesh)

    def body(scene, tables, env, light_volume, inverse_view, inverse_proj,
             view_proj, px, py):
        return render_hybrid_pixels(
            scene, tables, env, inverse_view, inverse_proj, view_proj,
            camera_near, camera_far, width, height, px, py,
            light_volume=light_volume,
            ray_tracing_enabled=ray_tracing_enabled)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), spec, spec),
        out_specs=spec, check_vma=False)
    result = sharded(scene, tables, env, light_volume,
                     jnp.asarray(inverse_view), jnp.asarray(inverse_proj),
                     jnp.asarray(view_proj), px, py)
    flat = np.asarray(result)
    if pad:
        flat = flat[:-pad]
    return flat.reshape(height, width, 3)
