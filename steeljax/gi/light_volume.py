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
                   config: RenderConfig | None = None,
                   mesh=None) -> jnp.ndarray:
    """Path-trace (P, 6, R, R, 3) probe cubemaps.

    Rays go straight through the cube-face basis (GetCubeDirection) with
    sub-texel jitter; output is linear HDR (RENDER_TO_HDR=1, no tone map,
    no accumulation image — the mean over spp is computed here).

    With a `jax.sharding.Mesh` the probe-face-pixel ray batch shards
    across the mesh (probes are embarrassingly parallel,
    GlobalIllumination.cpp:210-234): scene/tables replicate, rays split,
    zero per-bake collectives.  Per-ray seeds depend only on the global
    ray id, so the sharded bake equals the single-device bake exactly
    (tests/test_multidevice.py)."""
    config = config or RenderConfig()
    probe_config = dataclasses.replace(config, sample_count=1)
    p = len(positions)
    res = resolution
    dirs = face_directions(res)                       # (6, R, R, 3)
    n_rays = p * 6 * res * res

    # Base (unjittered) directions replicated per probe.
    base_dirs = np.broadcast_to(
        dirs, (p, 6, res, res, 3)).reshape(-1, 3).astype(np.float32)
    origins = np.repeat(np.asarray(positions, np.float32), 6 * res * res,
                        axis=0)
    from steeljax.core.constants import CUBE_FACES_B, CUBE_FACES_T
    face_index = (np.arange(n_rays) // (res * res)) % 6
    t_axis = np.asarray(CUBE_FACES_T, np.float32)[face_index]
    b_axis = np.asarray(CUBE_FACES_B, np.float32)[face_index]
    ray_ids = np.arange(n_rays, dtype=np.uint32)
    texel = 2.0 / res

    def sample_once(flat, tables, o, base_d, t_ax, b_ax, ids, s):
        seed = rng.make_seed(ids & jnp.uint32(0xFFFF),
                             ids >> jnp.uint32(16), s, 0)
        jitter, seed = rng.next_vec2(seed)
        # Displace directions by up to one texel along the face tangents.
        d = (base_d + (jitter[:, 0:1] - 0.5) * texel * t_ax
             + (jitter[:, 1:2] - 0.5) * texel * b_ax)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sample, _, _ = trace_paths(flat, tables, o, d, seed,
                                   0.001, 1000.0, probe_config)
        return sample

    if mesh is None:
        o = jnp.asarray(origins)
        base_d = jnp.asarray(base_dirs)
        t_ax = jnp.asarray(t_axis)
        b_ax = jnp.asarray(b_axis)
        ids = jnp.asarray(ray_ids)
        total = jnp.zeros((n_rays, 3), jnp.float32)
        for s in range(spp):
            total = total + sample_once(flat, tables, o, base_d, t_ax,
                                        b_ax, ids, s)
        flat_total = np.asarray(total)
    else:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from steeljax.parallel.mesh import _pixel_spec

        n_dev = mesh.devices.size
        padded = -(-n_rays // n_dev) * n_dev
        pad = padded - n_rays

        def prep(x, fill=0.0):
            return np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                          constant_values=fill)

        spec = _pixel_spec(mesh)
        shard = NamedSharding(mesh, spec)
        replicated = NamedSharding(mesh, P())
        o = jax.device_put(prep(origins), shard)
        # Pad rays get the +Z direction (a zero direction would NaN the
        # normalize); their results are sliced off below.
        base_pad = prep(base_dirs)
        base_pad[n_rays:, 2] = 1.0
        base_d = jax.device_put(base_pad, shard)
        t_ax = jax.device_put(prep(t_axis), shard)
        b_ax = jax.device_put(prep(b_axis), shard)
        ids = jax.device_put(prep(ray_ids), shard)
        flat_r = jax.device_put(flat, replicated)
        tables_r = jax.device_put(tables, replicated)

        body = jax.shard_map(
            sample_once, mesh=mesh,
            in_specs=(P(), P(), spec, spec, spec, spec, spec, P()),
            out_specs=spec, check_vma=False)
        total = jnp.zeros((padded, 3), jnp.float32)
        for s in range(spp):
            total = total + body(flat_r, tables_r, o, base_d, t_ax, b_ax,
                                 ids, jnp.uint32(s))
        flat_total = np.asarray(total)
        if pad:
            flat_total = flat_total[:-pad]
    cubes = (jnp.asarray(flat_total) / spp).reshape(p, 6, res, res, 3)
    return cubes


def generate_light_volume(flat, tables, spp: int = 8,
                          resolution: int = PROBE_RESOLUTION,
                          min_edge: float = probes_lib.MIN_EDGE,
                          max_probes: int = 1024,
                          config: RenderConfig | None = None,
                          mesh=None) -> LightVolume:
    """Full GI bake (probes -> cubes -> SH9 -> tets).  `mesh` shards the
    probe capture across devices (capture_probes)."""
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
    cubes = capture_probes(flat, tables, positions, resolution, spp,
                           config, mesh=mesh)
    coefficients = sh_lib.project_sh9(cubes)
    return LightVolume(
        positions=jnp.asarray(positions),
        tet_vertices=jnp.asarray(vertices),
        tet_neighbors=jnp.asarray(neighbors),
        tet_matrices=jnp.asarray(matrices),
        coefficients=coefficients)
