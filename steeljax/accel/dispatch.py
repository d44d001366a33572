"""Trace dispatch: one ray-query interface over the available backends.

The Vulkan reference calls traceRayEXT and lets the driver pick the
hardware path; steeljax's equivalent picks between:

* the Pallas packet kernel (TPU — steeljax.accel.pallas_traverse), and
* the vmapped stack traversal (CPU / interpret — steeljax.accel.traverse),

decided once at scene-preparation time and baked into the TraceTables
pytree as a static field (so jit specializes, like a shader define).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from steeljax.accel import traverse
from steeljax.accel import pallas_traverse as ptv
from steeljax.accel.bvh import BVH


@struct.dataclass
class TraceTables:
    bvh: BVH
    tris_packed: jnp.ndarray    # (T, 16) f32 (MT layout)
    use_pallas: bool = struct.field(pytree_node=False, default=False)


def backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # no devices at all
        return False


def make_trace_tables(bvh: BVH, tri_pos, tri_double_sided,
                      use_pallas: bool | None = None) -> TraceTables:
    if use_pallas is None:
        use_pallas = backend_is_tpu()
    return TraceTables(
        bvh=bvh,
        tris_packed=jnp.asarray(
            ptv.pack_tris(np.asarray(tri_pos),
                          np.asarray(tri_double_sided))),
        use_pallas=bool(use_pallas),
    )


def trace_nearest(tables: TraceTables, tri_pos, tri_double_sided, o, d,
                  t_min, t_max, cull_backface: bool = True):
    if tables.use_pallas:
        return ptv.trace_nearest_packet(
            tables.bvh, tables.tris_packed, o, d,
            t_min, t_max, cull_backface=cull_backface)
    return traverse.trace_nearest(
        tables.bvh, tri_pos, tri_double_sided, o, d, t_min, t_max,
        cull_backface=cull_backface)


def trace_any(tables: TraceTables, tri_pos, tri_double_sided, o, d,
              t_min, t_max):
    if tables.use_pallas:
        rec = ptv.trace_nearest_packet(
            tables.bvh, tables.tris_packed, o, d,
            t_min, t_max, cull_backface=False, any_hit=True)
        return rec["hit"]
    return traverse.trace_any(
        tables.bvh, tri_pos, tri_double_sided, o, d, t_min, t_max)
