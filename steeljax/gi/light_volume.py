"""Light-volume bake orchestration (GlobalIllumination.cpp:174-243).

Pipeline: probe positions (octree + geometry oracle) -> Delaunay tets ->
per-probe path-traced cubemap (the ProbeRenderer: 6 faces through the
shared bounce loop with RENDER_TO_CUBE ray setup and HDR output) -> SH-9
projection -> LightVolume pytree consumed by the deferred/forward lighting
(LIGHT_VOLUME_ENABLED paths).

Probes are embarrassingly parallel: all probe-face-pixel rays go through
one batched trace, which also makes multi-chip probe baking a pixel-axis
sharding problem like everything else (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from steeljax.core import rng
from steeljax.core.config import RenderConfig
from steeljax.env.cubemap import face_directions
from steeljax.gi import probes as probes_lib
from steeljax.gi import sh as sh_lib
from steeljax.gi import tets as tets_lib
from steeljax.render.pt.integrator import trace_paths

PROBE_RESOLUTION = 32  # ProbeRenderer.cpp:8-10 (32x32 RGBA16F faces)


@struct.dataclass
class LightVolume:
    positions: jnp.ndarray      # (P, 3) float32
    tet_vertices: jnp.ndarray   # (T, 4) int32
    tet_neighbors: jnp.ndarray  # (T, 4) int32, -1 at hull
    tet_matrices: jnp.ndarray   # (T, 3, 3) float32 inverse barycentric
    coefficients: jnp.ndarray   # (P, 9, 3) float32 SH-9 RGB


def capture_probes(flat, tables, positions: np.ndarray,
                   resolution: int = PROBE_RESOLUTION, spp: int = 8,
                   config: RenderConfig | None = None) -> jnp.ndarray:
    """Path-trace (P, 6, R, R, 3) probe cubemaps.

    Rays go straight through the cube-face basis (GetCubeDirection) with
    sub-texel jitter; output is linear HDR (RENDER_TO_HDR=1, no tone map,
    no accumulation image — the mean over spp is computed here)."""
    config = config or RenderConfig()
    probe_config = dataclasses.replace(config, sample_count=1)
    p = len(positions)
    res = resolution
    dirs = face_directions(res)                       # (6, R, R, 3)
    n_rays = p * 6 * res * res

    # Base (unjittered) directions replicated per probe.
    base_dirs = np.broadcast_to(dirs, (p, 6, res, res, 3)).reshape(-1, 3)
    origins = np.repeat(np.asarray(positions, np.float32), 6 * res * res,
                        axis=0)

    total = jnp.zeros((n_rays, 3), jnp.float32)
    o = jnp.asarray(origins)
    ray_ids = jnp.arange(n_rays, dtype=jnp.uint32)
    for s in range(spp):
        seed = rng.make_seed(ray_ids & jnp.uint32(0xFFFF),
                             ray_ids >> jnp.uint32(16), s, 0)
        jitter, seed = rng.next_vec2(seed)
        # Displace directions by up to one texel along the face tangents.
        from steeljax.core.constants import CUBE_FACES_B, CUBE_FACES_T
        face_index = (np.arange(n_rays) // (res * res)) % 6
        t_axis = jnp.asarray(CUBE_FACES_T)[face_index]
        b_axis = jnp.asarray(CUBE_FACES_B)[face_index]
        texel = 2.0 / res
        d = (jnp.asarray(base_dirs)
             + (jitter[:, 0:1] - 0.5) * texel * t_axis
             + (jitter[:, 1:2] - 0.5) * texel * b_axis)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sample, seed, _ = trace_paths(flat, tables, o, d, seed,
                                      0.001, 1000.0, probe_config)
        total = total + sample
    cubes = (total / spp).reshape(p, 6, res, res, 3)
    return cubes


def generate_light_volume(flat, tables, spp: int = 8,
                          resolution: int = PROBE_RESOLUTION,
                          min_edge: float = probes_lib.MIN_EDGE,
                          max_probes: int = 1024,
                          config: RenderConfig | None = None) -> LightVolume:
    positions = probes_lib.generate_probe_positions(
        np.asarray(flat.tri_pos), min_edge=min_edge, max_probes=max_probes)
    vertices, neighbors, matrices, positions = tets_lib.tetrahedralize(
        positions)
    if len(positions) == 0 or len(vertices) == 0:
        return LightVolume(
            positions=jnp.zeros((0, 3)), tet_vertices=jnp.zeros((0, 4),
                                                                jnp.int32),
            tet_neighbors=jnp.zeros((0, 4), jnp.int32),
            tet_matrices=jnp.zeros((0, 3, 3)),
            coefficients=jnp.zeros((0, 9, 3)))
    cubes = capture_probes(flat, tables, positions, resolution, spp, config)
    coefficients = sh_lib.project_sh9(cubes)
    return LightVolume(
        positions=jnp.asarray(positions),
        tet_vertices=jnp.asarray(vertices),
        tet_neighbors=jnp.asarray(neighbors),
        tet_matrices=jnp.asarray(matrices),
        coefficients=coefficients)
