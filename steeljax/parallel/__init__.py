"""Parallel execution over a device mesh.

The reference is single-GPU/single-queue (SURVEY.md §2.7): its only
concurrency is frames-in-flight.  steeljax's first-class parallelism is
pixel sharding across the ICI mesh — the natural decomposition of
traceRaysKHR(W, H) — with the scene replicated (it is read-only per frame)
and zero per-frame collectives.
"""

from steeljax.parallel.mesh import (  # noqa: F401
    make_mesh, render_frame_sharded, render_hybrid_frame_sharded,
    shard_pixels)
