"""Two-level acceleration structure: per-primitive BLAS + instance TLAS.

The reference builds one BLAS per Primitive at load time
(AccelerationStructureManager.cpp:62-126, built in the Primitive ctor,
Primitive.cpp:135-138) and rebuilds only the cheap instance TLAS every
frame from the TransformComponent x RenderComponent view
(AccelerationStructureManager.cpp:128-220, SceneRenderer.cpp:179-218).
steeljax's flattened path instead re-flattens world-space triangles and
rebuilds one big SAH tree on every scene revision — O(triangles) per
edit.  This module is the TPU-native two-level equivalent:

* BLAS: object-space BVH8 supernode rows + packed triangle records per
  primitive, built ONCE (native SAH) and cached by primitive identity.
* TLAS: an 8-wide median-split tree over instance world AABBs, rebuilt
  per scene revision on the host — O(instances log instances) numpy.
* One unified supernode table: TLAS rows first, then every cached BLAS's
  rows with child indices offset; instance rows carry the inverse world
  transform and the BLAS root, so re-preparing after a transform /
  material / instance edit re-uploads only the (I, 16)+(I, 48) instance
  rows — the BLAS and triangle tables stay resident on device.

Traversal (steeljax.accel.pallas_traverse._traverse_kernel8_inst)
transforms the whole packet into instance object space at an
instance-enter stack entry and restores world rays at a sentinel —
packet-uniform scalar work, no per-lane divergence.  Triangle facing is
determined by OBJECT-space winding, matching Vulkan's default (the
reference sets no VK_GEOMETRY_INSTANCE_TRIANGLE_FLIP_FACING_BIT;
Material.cpp:25-39 only disables culling for double-sided materials).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from steeljax.accel import traverse
from steeljax.accel import pallas_traverse as ptv
from steeljax.accel.bvh import BVH, apply_permutation, build_bvh, collapse_bvh8
from steeljax.accel.dispatch import backend_is_tpu
from steeljax.scene.flatten import pack_tri_shade, _to_linear_np


@struct.dataclass
class InstancedTables:
    """Device tables for two-level traversal (pytree)."""
    snode_rows: jnp.ndarray    # (S, 128) f32 — TLAS rows, then BLAS rows
    tris_packed: jnp.ndarray   # (R, 128) f32 — concatenated BLAS records
    inst_trace: jnp.ndarray    # (I, 48) f32 — layout in
    #                            pallas_traverse._INST_COLS: inverse world
    #                            3x4 (12), blas root (1), double_sided
    #                            (1), material id (1), 1/scale (1),
    #                            normal matrix (16:25), world linear
    #                            (25:34)
    inst_shade: jnp.ndarray    # (I, 48) f32: normal matrix (9), world
    #                            linear (9), material row (18:46 matching
    #                            tri_shade cols 28:56), uniform scale (46)
    blas_shade: jnp.ndarray    # (T, 28) f32 object-space geometric rows
    # Split of the unified supernode table (device scalar so instance-
    # count changes never recompile the kernel).
    n_tlas: jnp.ndarray = None  # () int32
    # Fused-shading record rows (pack_shade_records layout, object space,
    # concatenated per BLAS like tris_packed); None on the gather path.
    shade_rows: jnp.ndarray | None = None
    shade_mode: int = struct.field(pytree_node=False, default=0)
    depth: int = struct.field(pytree_node=False, default=1)
    max_leaf: int = struct.field(pytree_node=False, default=24)
    use_pallas: bool = struct.field(pytree_node=False, default=False)
    # Scene bounds (device arrays, so instance motion never recompiles) —
    # feed the ray-coherence sort keys (integrator.scene_bounds).
    aabb_lo: jnp.ndarray | None = None
    aabb_hi: jnp.ndarray | None = None
    # CPU/test path: per-instance python loop over per-BLAS tables.
    cpu_blas: tuple = struct.field(default=())          # tuple[CpuBlas]
    inst_blas: tuple = struct.field(pytree_node=False, default=())
    blas_tri_offset: tuple = struct.field(pytree_node=False, default=())

    @property
    def instance_count(self) -> int:
        return self.inst_trace.shape[0]


@struct.dataclass
class CpuBlas:
    bvh: BVH
    tri_pos: jnp.ndarray           # (Tp, 3, 3) permuted object space
    tri_double_sided: jnp.ndarray  # (Tp,)


class _Blas:
    """Host-side cached BLAS for one primitive."""

    def __init__(self, primitive, leaf_size: int):
        tri = np.asarray(primitive.indices).reshape(-1, 3)
        pos = np.asarray(primitive.positions, np.float32)
        tri_pos = pos[tri]
        bvh, order, padded = build_bvh(tri_pos, leaf_size)
        permuted = apply_permutation((None, order, padded), {
            "tri_pos": tri_pos,
            "tri_nrm": np.asarray(primitive.normals, np.float32)[tri],
            "tri_tan": np.asarray(primitive.tangents, np.float32)[tri],
            "tri_uv": np.asarray(primitive.tex_coords, np.float32)[tri],
        })
        self.bvh = bvh
        self.tri_pos = permuted["tri_pos"]
        # Facing comes from object-space winding; double-sidedness is an
        # instance (material) property applied at trace time.
        self.tri_ds = np.zeros(padded, bool)
        rows8, depth8 = collapse_bvh8(np.asarray(bvh.nodes), leaf_size)
        self.rows8 = rows8
        self.depth8 = depth8
        self.tris_packed = ptv.pack_tris(self.tri_pos, self.tri_ds)
        self.tri_nrm = permuted["tri_nrm"]
        self.tri_tan = permuted["tri_tan"]
        self.tri_uv = permuted["tri_uv"]
        self.shade = pack_tri_shade(
            permuted["tri_nrm"], permuted["tri_tan"], permuted["tri_uv"],
            permuted["tri_pos"])[:, :28]
        self.padded = padded
        # AABB over real triangles (object space).
        real = self.tri_pos[:, 0, 0] < 1e37
        if real.any():
            pts = self.tri_pos[real].reshape(-1, 3)
            self.lo, self.hi = pts.min(axis=0), pts.max(axis=0)
        else:
            self.lo = np.zeros(3, np.float32)
            self.hi = np.zeros(3, np.float32)


def _build_tlas8(lo: np.ndarray, hi: np.ndarray) -> tuple[np.ndarray, int]:
    """8-wide median-split tree over instance AABBs.

    Child slots: meta1 == -1 -> instance (meta0 = instance id);
    meta1 == 0 -> internal (meta0 = supernode id); empty slots have
    inverted AABBs and meta0 = -1.  Returns (rows (S, 128), depth)."""
    count = len(lo)
    centers = (lo + hi) * 0.5
    rows: list[np.ndarray] = []

    def rec(ids: np.ndarray) -> tuple[int, int]:
        sid = len(rows)
        rows.append(np.zeros(128, np.float32))
        if len(ids) <= 8:
            groups = [np.array([i]) for i in ids]
        else:
            groups = [ids]
            for _ in range(3):
                nxt = []
                for g in groups:
                    if len(g) <= 1:
                        nxt.append(g)
                        continue
                    c = centers[g]
                    axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
                    order = g[np.argsort(c[:, axis], kind="stable")]
                    h = len(order) // 2
                    nxt.extend([order[:h], order[h:]])
                groups = nxt
            groups = [g for g in groups if len(g)]
        depth = 1
        row = rows[sid]
        for slot in range(8):
            off = 16 * slot
            if slot < len(groups):
                g = groups[slot]
                row[off:off + 3] = lo[g].min(axis=0)
                row[off + 3:off + 6] = hi[g].max(axis=0)
                if len(g) == 1:
                    row[off + 6] = float(g[0])
                    row[off + 7] = -1.0
                else:
                    child, d = rec(g)
                    row = rows[sid]
                    row[off + 6] = float(child)
                    row[off + 7] = 0.0
                    depth = max(depth, 1 + d)
            else:
                row[off:off + 3] = 3.0e37
                row[off + 3:off + 6] = -3.0e37
                row[off + 6] = -1.0
                row[off + 7] = 0.0
        return sid, depth

    if count == 0:
        row = np.zeros(128, np.float32)
        for slot in range(8):
            off = 16 * slot
            row[off:off + 3] = 3.0e37
            row[off + 3:off + 6] = -3.0e37
            row[off + 6] = -1.0
        return row[None], 1
    _, depth = rec(np.arange(count))
    return np.stack(rows), depth


def _pack_inst_material(mat) -> np.ndarray:
    """Material constants in tri_shade col 28:56 semantics (28 floats):
    [mat id, emission linear (3), base linear (3), base alpha, roughness,
    metallic, alpha cutoff, normal scale, flags, tex ids (5), base raw
    (3), emission raw (3), occlusion strength, pad (3)]."""
    out = np.zeros(28, np.float32)
    base = np.asarray(mat.base_color_factor, np.float32)
    emission = np.asarray(mat.emission_factor, np.float32)[:3]
    out[1:4] = _to_linear_np(emission)
    out[4:7] = _to_linear_np(base[:3])
    out[7] = base[3]
    out[8] = mat.roughness_factor
    out[9] = mat.metallic_factor
    out[10] = mat.alpha_cutoff
    out[11] = mat.normal_scale
    out[12] = float(int(mat.flags))
    out[13:18] = [mat.base_color_texture, mat.roughness_metallic_texture,
                  mat.normal_texture, mat.occlusion_texture,
                  mat.emission_texture]
    out[18:21] = base[:3]
    out[21:24] = emission
    out[24] = mat.occlusion_strength
    return out


class InstancedAccel:
    """Host-side manager — the AccelerationStructureManager analog.

    BLAS are cached by primitive identity; the unified supernode/triangle
    device tables are rebuilt only when the cached BLAS set changes.
    `prepare(scene)` is O(instances) for transform/material/instance
    edits over known primitives."""

    def __init__(self, leaf_size: int = 24, use_pallas: bool | None = None):
        self.leaf_size = leaf_size
        self.use_pallas = (backend_is_tpu() if use_pallas is None
                           else use_pallas)
        self._blas: dict[int, _Blas] = {}      # id(primitive) -> BLAS
        self._packed = None                    # (snode_rows, tris, shade,
        #                                         meta per blas id)
        self._packed_key = None
        self.blas_builds = 0                   # test observability

    def _get_blas(self, primitive) -> tuple[int, _Blas]:
        key = id(primitive)
        blas = self._blas.get(key)
        if blas is None:
            blas = _Blas(primitive, self.leaf_size)
            self._blas[key] = blas
            self.blas_builds += 1
        return key, blas

    def _pack_blas_tables(self, shade_mode: int):
        """Concatenate TLAS + cached BLAS tables into unified arrays.
        The BLAS section is cached on device and reused across revisions;
        only the TLAS prefix (O(instances)) changes."""
        key = (tuple(sorted(self._blas)), shade_mode)
        if self._packed_key != key:
            offsets = {}
            rows_parts, tri_parts, shade_parts, fused_parts = [], [], [], []
            srow, tri0 = 0, 0
            for bkey in key[0]:
                blas = self._blas[bkey]
                offsets[bkey] = (srow, tri0)
                rows = blas.rows8.copy()
                for c in range(8):
                    internal = (rows[:, 16 * c + 7] == 0) \
                        & (rows[:, 16 * c + 6] >= 0)
                    rows[internal, 16 * c + 6] += srow
                    leaf = rows[:, 16 * c + 7] > 0
                    rows[leaf, 16 * c + 6] += tri0
                rows_parts.append(rows)
                tri_parts.append(blas.tris_packed)
                shade_parts.append(blas.shade)
                if shade_mode:
                    # Object-space fused records; the material column is
                    # overridden per instance inside the kernel, uvd is
                    # object-space (scaled by 1/instance-scale at trace).
                    fused_parts.append(ptv.pack_shade_records(
                        blas.tri_nrm, blas.tri_tan, blas.tri_uv,
                        np.zeros(blas.padded, np.float32),
                        textured=shade_mode == 2,
                        tri_uvd=blas.shade[:, 27]))
                srow += len(rows)
                tri0 += blas.padded
            self._packed = (
                np.concatenate(rows_parts) if rows_parts
                else np.zeros((0, 128), np.float32),
                jnp.asarray(np.concatenate(tri_parts)) if tri_parts
                else jnp.zeros((0, 128), jnp.float32),
                jnp.asarray(np.concatenate(shade_parts)) if shade_parts
                else jnp.zeros((0, 28), jnp.float32),
                (jnp.asarray(np.concatenate(fused_parts))
                 if fused_parts else None),
                offsets)
            self._packed_key = key
        return self._packed

    def prepare(self, scene) -> InstancedTables:
        """Build/refresh the instance tables for the scene's current
        entity state (the per-frame BuildTlas analog)."""
        from steeljax.scene.material import MaterialFlags

        entries = []   # (blas key, world, material, material id)
        for ei in scene.renderable_entities():
            world = scene.world_transform(ei)
            for ro in scene.entities[ei].render_objects:
                bkey, _ = self._get_blas(scene.primitives[ro.primitive])
                entries.append((bkey, np.asarray(world, np.float32),
                                scene.materials[ro.material], ro.material))

        # Fused shading mirrors the flat path's gating: alpha-test
        # materials force the row-gather path (the bounded any-hit
        # re-trace reads full rows).
        any_alpha_test = any(
            (m.flags & MaterialFlags.ALPHA_TEST)
            and m.base_color_texture >= 0 for m in scene.materials)
        shade_mode = 0
        if self.use_pallas and not any_alpha_test:
            shade_mode = 2 if scene.textures else 1

        blas_rows, tris_packed, blas_shade, fused_rows, offsets = \
            self._pack_blas_tables(shade_mode)
        n_blas_rows = len(blas_rows)

        count = len(entries)
        lo = np.zeros((count, 3), np.float32)
        hi = np.zeros((count, 3), np.float32)
        inst_trace = np.zeros((count, 48), np.float32)
        inst_shade = np.zeros((count, 48), np.float32)
        cpu_blas_keys = []
        max_blas_depth = 1
        for i, (bkey, world, mat, mid) in enumerate(entries):
            blas = self._blas[bkey]
            srow, _ = offsets[bkey]
            inv = np.linalg.inv(world)[:3, :4]
            inst_trace[i, 0:12] = inv.reshape(-1)
            inst_trace[i, 13] = float(
                bool(mat.flags & MaterialFlags.DOUBLE_SIDED))
            lin = world[:3, :3]
            nmat = np.linalg.inv(lin).T
            scale = float(np.cbrt(abs(np.linalg.det(lin))))
            inst_trace[i, 14] = float(mid)
            inst_trace[i, 15] = 1.0 / max(scale, 1e-6)
            inst_trace[i, 16:25] = nmat.reshape(-1)
            inst_trace[i, 25:34] = lin.reshape(-1)
            inst_shade[i, 0:9] = nmat.reshape(-1)
            inst_shade[i, 9:18] = lin.reshape(-1)
            inst_shade[i, 18:46] = _pack_inst_material(mat)
            inst_shade[i, 46] = scale
            # World AABB = transformed object AABB corners.
            cs = np.stack(np.meshgrid(
                [blas.lo[0], blas.hi[0]], [blas.lo[1], blas.hi[1]],
                [blas.lo[2], blas.hi[2]], indexing="ij"),
                axis=-1).reshape(-1, 3)
            wc = cs @ lin.T + world[:3, 3]
            lo[i], hi[i] = wc.min(axis=0), wc.max(axis=0)
            cpu_blas_keys.append(bkey)
            max_blas_depth = max(max_blas_depth, blas.depth8)

        tlas_rows, tlas_depth = _build_tlas8(lo, hi)
        n_tlas = len(tlas_rows)
        # Shift every BLAS child reference past the TLAS prefix, and point
        # each instance at its (shifted) BLAS root.
        snode = np.concatenate([tlas_rows, blas_rows.copy()]) \
            if n_blas_rows else tlas_rows
        blas_section = snode[n_tlas:]
        for c in range(8):
            internal = (blas_section[:, 16 * c + 7] == 0) \
                & (blas_section[:, 16 * c + 6] >= 0)
            blas_section[internal, 16 * c + 6] += n_tlas
            # TLAS internal children already index TLAS rows (no shift).
        for i, bkey in enumerate(cpu_blas_keys):
            inst_trace[i, 12] = float(offsets[bkey][0] + n_tlas)

        sorted_keys = sorted(self._blas)
        cpu_blas = tuple(
            CpuBlas(bvh=self._blas[k].bvh,
                    tri_pos=jnp.asarray(self._blas[k].tri_pos),
                    tri_double_sided=jnp.asarray(self._blas[k].tri_ds))
            for k in sorted_keys)
        blas_index = {k: j for j, k in enumerate(sorted_keys)}

        return InstancedTables(
            snode_rows=jnp.asarray(snode),
            tris_packed=tris_packed,
            inst_trace=jnp.asarray(inst_trace),
            inst_shade=jnp.asarray(inst_shade),
            blas_shade=(blas_shade if isinstance(blas_shade, jnp.ndarray)
                        else jnp.asarray(blas_shade)),
            n_tlas=jnp.asarray(n_tlas, jnp.int32),
            shade_rows=fused_rows,
            shade_mode=shade_mode,
            depth=tlas_depth + 1 + max_blas_depth,
            max_leaf=self.leaf_size,
            use_pallas=self.use_pallas,
            aabb_lo=jnp.asarray(lo.min(axis=0) if count else
                                np.zeros(3, np.float32)),
            aabb_hi=jnp.asarray(hi.max(axis=0) if count else
                                np.ones(3, np.float32)),
            cpu_blas=cpu_blas,
            inst_blas=tuple(blas_index[k] for k in cpu_blas_keys),
            blas_tri_offset=tuple(
                offsets[k][1] for k in sorted_keys))


def _transform_rays(inv_row, o, d):
    a = inv_row[:12].reshape(3, 4)
    o2 = o @ a[:, :3].T + a[:, 3]
    d2 = d @ a[:, :3].T
    return o2, d2


def trace_nearest_instanced(tables: InstancedTables, o, d, t_min, t_max,
                            cull_backface: bool = True,
                            any_hit: bool = False):
    """Two-level nearest hit.  Returns the trace record plus "inst" (N,)
    int32 instance ids (-1 on miss)."""
    tmn = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), o.shape[:1])
    tmx = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    if tables.use_pallas:
        return ptv.trace_nearest_packet8_inst(
            tables, o, d, tmn, tmx, cull_backface=cull_backface,
            any_hit=any_hit)

    # CPU/test path: sequential per-instance traversal with interval
    # shrinking (the chunk pattern), O(instances) program size.
    best = None
    cur_tmx = tmx
    for i in range(tables.instance_count):
        blas = tables.cpu_blas[tables.inst_blas[i]]
        row = tables.inst_trace[i]
        o2, d2 = _transform_rays(row, o, d)
        ds = jnp.broadcast_to(row[13] > 0.5,
                              blas.tri_double_sided.shape)
        rec = traverse.trace_nearest(
            blas.bvh, blas.tri_pos, blas.tri_double_sided | ds, o2, d2,
            tmn, cur_tmx, cull_backface=cull_backface)
        rec = dict(rec)
        rec["inst"] = jnp.where(rec["hit"], i, -1)
        rec["tri"] = jnp.where(
            rec["hit"],
            rec["tri"] + tables.blas_tri_offset[tables.inst_blas[i]], -1)
        if best is None:
            best = rec
        else:
            better = rec["hit"] & (~best["hit"] | (rec["t"] < best["t"]))
            best = {k: jnp.where(better, rec[k], best[k]) for k in best}
        cur_tmx = jnp.where(best["hit"], best["t"], cur_tmx)
    if best is None:
        n = o.shape[0]
        best = {"t": jnp.full((n,), -1.0), "tri": jnp.full((n,), -1,
                jnp.int32), "u": jnp.zeros((n,)), "v": jnp.zeros((n,)),
                "hit": jnp.zeros((n,), bool),
                "inst": jnp.full((n,), -1, jnp.int32)}
    return best
