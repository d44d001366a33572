"""Device-mesh pixel sharding for rendering.

Design (SURVEY.md §2.7 / §7): the frame is a flat pixel batch; we lay the
batch out across a 1D `jax.sharding.Mesh` axis ("tiles") with
NamedSharding, replicate the scene + BVH, and jit the integrator.  XLA's
SPMD partitioner then runs each device on its own pixel rows with no
communication — sample accumulation is per-pixel-local (the running mean of
RayGen.rgen:308-319), so the PT pipeline needs zero collectives; a final
all-gather materializes the image only when the host asks for it.

Multi-host meshes over DCN compose the same way (pixel axis first); probe
bakes (gi/) fan out over the same mesh with probes as the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from steeljax.core.config import RenderConfig
from steeljax.render.pt.integrator import render_pixels

PIXEL_AXIS = "tiles"


def make_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (PIXEL_AXIS,))


def shard_pixels(mesh: Mesh, width: int, height: int):
    """Flat pixel-coordinate arrays laid out across the mesh axis.

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
    sharding = NamedSharding(mesh, P(PIXEL_AXIS))
    return (jax.device_put(px, sharding), jax.device_put(py, sharding),
            padded - count)


def render_frame_sharded(scene, tables, inverse_view, inverse_proj,
                         camera_near, camera_far, width: int, height: int,
                         mesh: Mesh, accumulation_index=0, sample_index=0,
                         config: RenderConfig = RenderConfig()):
    """Render one sharded frame; returns the (H, W, 3) host image."""
    px, py, pad = shard_pixels(mesh, width, height)
    replicated = NamedSharding(mesh, P())
    scene = jax.device_put(scene, replicated)
    tables = jax.device_put(tables, replicated)
    result = render_pixels(
        scene, tables, jnp.asarray(inverse_view), jnp.asarray(inverse_proj),
        camera_near, camera_far, width, height, px, py,
        accumulation_index, sample_index, config)
    flat = np.asarray(result)
    if pad:
        flat = flat[:-pad]
    return flat.reshape(height, width, 3)
