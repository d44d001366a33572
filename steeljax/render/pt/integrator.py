"""Monte-Carlo path-tracing integrator.

Faithful TPU re-expression of the reference's ray-generation kernel
(Source/Shaders/PathTracing/RayGen.rgen:322-425): per pixel — seeded
xoroshiro stream, jittered primary ray from the inverse proj/view matrices,
a bounded bounce loop (miss -> environment; emission; next-event estimation
against punctual lights with irradiance-proportional light pick; BRDF
importance sampling; Russian roulette after bounce 2), irradiance clamp,
running-mean accumulation.

Architecture differences from the Vulkan original, by design:

* megakernel SIMT -> lockstep masked lanes over a flat ray batch; the bounce
  loop is unrolled (static trip count), dead lanes ride along masked.  This
  matches the TPU's VPU model; per-bounce stream compaction is a later
  optimization (SURVEY.md §7 M2).
* traceRayEXT -> LBVH traversal (steeljax.accel); any-hit alpha testing ->
  bounded re-trace past alpha-rejected hits.
* push constants / shader defines -> static jit arguments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from steeljax.accel.dispatch import TraceTables
from steeljax.accel.dispatch import trace_any, trace_nearest
from steeljax.core import rng
from steeljax.core.colors import luminance, to_linear
from steeljax.core.config import RenderConfig
from steeljax.core.constants import (
    BIAS, DIRECT_LIGHT_DISK_RADIUS, EPSILON, PI,
    POINT_LIGHT_RADIUS, RAY_DEAD_T, RAY_MAX_T, RAY_MIN_T)
from steeljax.env.cubemap import sample_cube_quads
from steeljax.render.pt import brdf as brdf_lib
from steeljax.render.texture import sample_bilinear
from steeljax.scene.flatten import FlatScene
from steeljax.scene.material import MaterialFlags


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


# ---------------------------------------------------------------------------
# Ray generation (RayGen.rgen:52-70)
# ---------------------------------------------------------------------------

def primary_rays(inverse_view, inverse_proj, width, height, px, py, seed,
                 render_to_cube: bool = False):
    """Jittered primary rays for pixels (px, py); returns (o, d, seed) with
    o/d shaped (N, 3)."""
    xs = px.astype(jnp.float32)
    ys = py.astype(jnp.float32)

    jitter, seed = rng.next_vec2(seed)
    u = (xs + jitter[..., 0]) / width
    v = (ys + jitter[..., 1]) / height
    xy = jnp.stack([u, v], axis=-1) * 2.0 - 1.0
    if render_to_cube:
        xy = xy * jnp.asarray([-1.0, 1.0], jnp.float32)

    target = jnp.einsum("ij,nj->ni", inverse_proj,
                        jnp.concatenate([xy, jnp.ones_like(xy)], axis=-1))
    direction = _normalize(target[..., :3])
    direction = jnp.einsum(
        "ij,nj->ni", inverse_view,
        jnp.concatenate([direction, jnp.zeros_like(direction[..., :1])],
                        axis=-1))[..., :3]
    origin = jnp.broadcast_to(inverse_view[:3, 3], direction.shape)
    return origin, _normalize(direction), seed


# ---------------------------------------------------------------------------
# Hit shading inputs (ClosestHit.rchit + UnpackMaterial, RayGen.rgen:72-115)
# ---------------------------------------------------------------------------

def shade_rows(scene: FlatScene, tables, rec):
    """The per-hit (N, 56) shading row (tri_shade layout, world space).

    Flattened path: one tri_shade row gather.  Instanced path
    (accel.instances): compose the object-space geometric BLAS row with
    the instance's material row and rotate normals/tangents into world
    space with the instance's normal / linear matrices — the ClosestHit
    objectToWorld transform (ClosestHit.rchit:55-60) done at shade time."""
    from steeljax.accel.instances import InstancedTables

    tri = jnp.maximum(rec["tri"], 0)
    if not isinstance(tables, InstancedTables):
        return scene.tri_shade[tri]

    inst = jnp.maximum(rec["inst"], 0)
    geo = tables.blas_shade[tri]        # (N, 28) object space
    n_inst = tables.inst_shade.shape[0]
    if n_inst <= 32:
        # Select chain over a small instance count — a per-index gather
        # costs ~10 ms per 2M rays even from a tiny table.
        irow = jnp.broadcast_to(tables.inst_shade[0], inst.shape + (48,))
        for i in range(1, n_inst):
            irow = jnp.where((inst == i)[:, None], tables.inst_shade[i],
                             irow)
    else:
        irow = tables.inst_shade[inst]  # (N, 48)
    nm = irow[:, 0:9]
    wl = irow[:, 9:18]

    def rotate(vecs, m, k):
        out = []
        for i in range(k):
            v = vecs[:, 3 * i:3 * i + 3]
            out.append(jnp.stack([
                m[:, 0] * v[:, 0] + m[:, 1] * v[:, 1] + m[:, 2] * v[:, 2],
                m[:, 3] * v[:, 0] + m[:, 4] * v[:, 1] + m[:, 5] * v[:, 2],
                m[:, 6] * v[:, 0] + m[:, 7] * v[:, 1] + m[:, 8] * v[:, 2],
            ], axis=-1))
        return jnp.concatenate(out, axis=-1)

    normals = rotate(geo[:, 0:9], nm, 3)
    tangents = rotate(geo[:, 9:18], wl, 3)
    geom_n = rotate(geo[:, 24:27], nm, 1)
    # uv density is per-world-length: divide by the instance scale.
    uvd = geo[:, 27:28] / jnp.maximum(irow[:, 46:47], 1e-6)
    return jnp.concatenate(
        [normals, tangents, geo[:, 18:24], geom_n, uvd, irow[:, 18:46]],
        axis=-1)


def _alpha_rejected(scene: FlatScene, rec, row):
    """hit & alpha-test & alpha < cutoff at a hit (AnyHit.rahit:35-52).
    One shading-row read covers flags, cutoff, alpha factor, base
    texture id, and the uv triangle."""
    flags = row[:, 40].astype(jnp.int32)
    is_alpha_test = (flags & int(MaterialFlags.ALPHA_TEST)) != 0
    alpha = row[:, 35]
    if scene.has_textures:
        u, v = rec["u"], rec["v"]
        w = (1.0 - u - v)[..., None]
        uv = (row[:, 18:20] * w + row[:, 20:22] * u[..., None]
              + row[:, 22:24] * v[..., None])
        tex = row[:, 41].astype(jnp.int32)
        sampled = sample_bilinear(scene.atlas, scene.tex_offset,
                                  scene.tex_size, tex, uv)[..., 3]
        alpha = alpha * jnp.where(tex >= 0, sampled, 1.0)
    return rec["hit"] & is_alpha_test & (alpha < row[:, 38])


def _part1by2(x):
    """Spread 5 bits of x across every third bit (Morton interleave)."""
    x = x & 0x1F
    x = (x | (x << 8)) & 0x100F
    x = (x | (x << 4)) & 0x10C3
    x = (x | (x << 2)) & 0x1249
    return x


def _ray_sort_key(o, d, lo, inv_extent):
    """18-bit coherence key: 15-bit Morton cell of the origin (5 bits per
    axis over the scene AABB), direction octant in the low 3 bits.

    Key-order ablation (1.6M-tri stress scene): octant-major looked ~6%
    better on an isolated incoherent trace but measured consistently
    WORSE in the full frame (0.59 vs 0.62 Mray/s) — with dead-ray
    compaction in the top bits, origin locality matters more than a
    shared traversal direction.  Morton-major stays."""
    q = jnp.clip((o - lo) * inv_extent * 32.0, 0.0, 31.0).astype(jnp.int32)
    morton = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
              | (_part1by2(q[:, 2]) << 2))
    octant = ((d[:, 0] > 0).astype(jnp.int32)
              | ((d[:, 1] > 0).astype(jnp.int32) << 1)
              | ((d[:, 2] > 0).astype(jnp.int32) << 2))
    return (morton << 3) | octant


# Scenes above this effective triangle count repack in-flight rays each
# bounce (compaction + coherence sort, see trace_paths); below it the
# payload sort costs more than the whole packet union sweep.
REPACK_MIN_TRIS = 200_000

# K-nearest candidates collected per traversal on the multi-hit alpha
# path (_trace_material_multihit): the integrator exact-tests K hits per
# traversal instead of one, so re-traces run only for rays whose K
# nearest mask-passing candidates ALL reject.  Env override
# STEELJAX_MULTIHIT_K for A/B.  DEFAULT 0 (single-hit + coverage masks +
# rejected-first compaction): measured FASTER than K=4 on both the
# adversarial serrated canopy (0.269 vs 0.225 Mray/s, fine masks) and
# coarse masks (0.262 vs 0.218) — the K-th accepted candidate is a far
# weaker prune bound than the nearest-accepted hit, and sorted slot
# insertion doubles leaf vector work (round-4 sweep, /tmp logs +
# CLAUDE.md round-4 findings).
MULTIHIT_K = 0


def _multihit_k() -> int:
    import os
    return int(os.environ.get("STEELJAX_MULTIHIT_K", str(MULTIHIT_K)))


def _total_triangles(tables) -> int:
    """Static triangle-count estimate for the sort gate."""
    from steeljax.accel.instances import InstancedTables

    if isinstance(tables, InstancedTables):
        # Effective size = instances x mean BLAS size (the world the rays
        # actually traverse), not the deduplicated BLAS triangle pool.
        from steeljax.accel.bvh import TRI_PER_ROW
        n_blas = max(len(tables.blas_tri_offset), 1)
        mean_blas = max(
            tables.tris_packed.shape[0] * TRI_PER_ROW // n_blas, 1)
        return tables.inst_trace.shape[0] * mean_blas
    return sum(c.rows for c in tables.chunks)


def scene_bounds(tables) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(lo, inv_extent) for ray-sort keys, from the static chunk AABBs
    (flat tables) or the device instance bounds (instanced tables)."""
    from steeljax.accel.instances import InstancedTables

    if isinstance(tables, InstancedTables):
        return tables.aabb_lo, 1.0 / jnp.maximum(
            tables.aabb_hi - tables.aabb_lo, 1e-6)
    lo = np.min([c.aabb[0] for c in tables.chunks], axis=0)
    hi = np.max([c.aabb[1] for c in tables.chunks], axis=0)
    return (jnp.asarray(lo, jnp.float32),
            jnp.asarray(1.0 / np.maximum(hi - lo, 1e-6), jnp.float32))


def repack_rays(key, columns):
    """Reorder the whole in-flight ray state by `key` with ONE stable
    lax.sort carrying every state array as a payload column.

    Random-access data movement is the wrong tool on TPU: a permutation
    gather costs ~12 ns per *index* (~11 ms per 1M rays per array), which
    is why the round-2 argsort+gather reorder experiment LOST on Cornell
    (+40 ms/bounce).  lax.sort moves payloads through an oblivious
    sorting network — sequential, bandwidth-bound passes — so the entire
    22-column ray state repacks for roughly the cost of one wide sweep.
    No inverse map is needed: state *stays* permuted across bounces and a
    final sort by the carried pixel-slot column restores frame order.

    `columns` is a flat list of (N,) or (N, k) arrays; (N, k) arrays are
    split into k scalar columns and re-stacked on return."""
    flat_cols = []
    spec = []
    for c in columns:
        if c.ndim == 1:
            flat_cols.append(c)
            spec.append(None)
        else:
            k = c.shape[1]
            flat_cols.extend(c[:, i] for i in range(k))
            spec.append(k)
    outs = jax.lax.sort((key, *flat_cols), num_keys=1, is_stable=True)
    sorted_key = outs[0]
    it = iter(outs[1:])
    result = []
    for s in spec:
        if s is None:
            result.append(next(it))
        else:
            result.append(jnp.stack([next(it) for _ in range(s)], axis=-1))
    return sorted_key, result


def trace_material_ray(scene: FlatScene, tables: TraceTables, o, d,
                       t_min, t_max,
                       cull_backface: bool, max_alpha_retrace: int,
                       shared_origin: bool = False, coherent: bool = False):
    """Nearest hit honoring any-hit alpha testing: re-trace past rejected
    hits up to `max_alpha_retrace` times (the reference's unbounded any-hit
    loop is bounded here for static control flow).

    Rays are traced in caller order: primaries arrive tile-ordered
    (tiled_order) and big-scene secondary bounces arrive repacked by
    trace_paths (alive-first + Morton/octant, via one payload sort —
    repack_rays); per-array argsort+gather reordering was measured and
    rejected (~12 ns/index on TPU)."""
    from steeljax.accel.instances import (InstancedTables,
                                          trace_nearest_instanced)

    if isinstance(tables, InstancedTables):
        def trace(o, d, tmn, tmx):
            return trace_nearest_instanced(tables, o, d, tmn, tmx,
                                           cull_backface=cull_backface)
    else:
        def trace(o, d, tmn, tmx):
            return trace_nearest(tables, scene.tri_pos,
                                 scene.tri_double_sided, o, d, tmn, tmx,
                                 cull_backface=cull_backface,
                                 shared_origin=shared_origin,
                                 coherent=coherent)

    k_hits = _multihit_k()
    if (scene.any_alpha_test and k_hits > 0
            and not isinstance(tables, InstancedTables)
            and tables.use_pallas and tables.treelets is None
            and tables.shade_mode == 0 and len(tables.chunks) == 1):
        # Multi-hit path: ONE traversal returns the K nearest mask-
        # passing candidates; the exact test runs per slot and re-traces
        # only rays whose K candidates all rejected (the reference's
        # in-traversal any-hit continuation, AnyHit.rahit:25-52).  Gated
        # to the gather-shade flat path — exactly the big-scene regime
        # where restart passes cost full traversals.
        return _trace_material_multihit(scene, tables, o, d, t_min, t_max,
                                        cull_backface, max_alpha_retrace,
                                        k_hits)

    rec = trace(o, d, t_min, t_max)
    if not scene.any_alpha_test:
        return rec

    # Bounded any-hit loop, gated: each pass re-traces ONLY rays whose
    # current hit was alpha-rejected (others get an inverted interval and
    # cost the packets nothing), and the whole pass is skipped via lax.cond
    # when no ray was rejected — so alpha scenes pay ~one cheap reduction,
    # not max_alpha_retrace full traversals, on bounces with no rejections.
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), o.shape[:1])
    count = o.shape[0]
    rejected = _alpha_rejected(scene, rec, shade_rows(scene, tables, rec))

    # Dense-foliage scenes reject MOST first hits (speckled alpha masks:
    # measured 78% of primary rays on the foliage bench even with the
    # in-kernel coverage masks), and rejected rays stay SCATTERED across
    # packets, so every retrace pass cost as much as a full traversal
    # (measured 4.8 s/pass at 0.9M rays, linear in max_alpha_retrace).
    # One payload sort (repack_rays) moving rejected rays to the front —
    # Morton-ordered by their current HIT POINT, the retrace's effective
    # origin — makes later passes' live packets dense and coherent while
    # finished packets root-pop; one slot sort restores order at the end.
    compact = (_total_triangles(tables) > REPACK_MIN_TRIS
               and count >= 64 * 128)
    rec_keys = sorted(rec.keys())

    def _to_cols(rec):
        return [rec[k].astype(jnp.int32) if rec[k].dtype == bool
                else rec[k] for k in rec_keys]

    def _from_cols(cols, template):
        return {k: (c == 1) if template[k].dtype == bool else c
                for k, c in zip(rec_keys, cols)}

    if compact:
        lo, inv_extent = scene_bounds(tables)
        p = o + d * jnp.maximum(rec["t"], 0.0)[..., None]
        key = (((~rejected).astype(jnp.int32) << 19)
               | _ray_sort_key(p, d, lo, inv_extent))
        slot = jnp.arange(count, dtype=jnp.int32)
        key, cols = repack_rays(key, [o, d, tmax, slot] + _to_cols(rec))
        o, d, tmax, slot = cols[:4]
        rec = _from_cols(cols[4:], rec)
        rejected = (key >> 19) == 0

    def retrace_pass(state):
        rec, rejected = state

        def do_retrace(rec):
            # Relative epsilon: an absolute 1e-4 is below one fp32 ulp of
            # t for far hits, which would re-find the same rejected
            # triangle and burn the retrace budget (ADVICE r3).
            new_tmin = rec["t"] * (1.0 + 1e-4) + 1e-4
            rec2 = trace(o, d, new_tmin, jnp.where(rejected, tmax, RAY_DEAD_T))
            return {k: jnp.where(rejected, rec2[k], rec[k]) for k in rec}

        rec = jax.lax.cond(jnp.any(rejected), do_retrace, lambda r: r, rec)
        # Only previously-rejected rays changed, so the rejected set can
        # only shrink: & keeps the check from resurrecting settled rays.
        rejected = rejected & _alpha_rejected(
            scene, rec, shade_rows(scene, tables, rec))
        return rec, rejected

    for _ in range(max_alpha_retrace):
        rec, rejected = retrace_pass((rec, rejected))
    # Hits that are still alpha-rejected after the bounded loop count as
    # misses (conservative vs the reference's exhaustive walk).
    rec["hit"] = rec["hit"] & ~rejected
    rec["tri"] = jnp.where(rec["hit"], rec["tri"], -1)
    rec["t"] = jnp.where(rec["hit"], rec["t"], -1.0)
    if compact:
        _, cols = repack_rays(slot, _to_cols(rec))
        rec = _from_cols(cols, rec)
    return rec


def _resolve_multihit(scene: FlatScene, tables, slots):
    """Winner selection over K sorted candidate slots: the first slot
    that is a hit and survives the EXACT alpha test (_alpha_rejected,
    the authority the conservative kernel masks defer to) wins; an empty
    slot means the ray ran out of surfaces (resolved miss).  Returns
    (rec, exhausted) where exhausted = all K slots hit and all rejected
    (more surfaces may exist past slot K-1)."""
    k_hits, n = slots["t"].shape
    rec = {"t": jnp.full((n,), -1.0, jnp.float32),
           "tri": jnp.full((n,), -1, jnp.int32),
           "u": jnp.zeros((n,), jnp.float32),
           "v": jnp.zeros((n,), jnp.float32),
           "hit": jnp.zeros((n,), bool)}
    resolved = jnp.zeros((n,), bool)
    for k in range(k_hits):
        rec_k = {"t": slots["t"][k], "u": slots["u"][k],
                 "v": slots["v"][k], "tri": slots["tri"][k],
                 "hit": slots["tri"][k] >= 0}
        rej = _alpha_rejected(scene, rec_k,
                              shade_rows(scene, tables, rec_k))
        take = ~resolved & rec_k["hit"] & ~rej
        for f in ("t", "u", "v", "tri"):
            rec[f] = jnp.where(take, rec_k[f], rec[f])
        rec["hit"] = rec["hit"] | take
        # A non-hit slot implies every later slot is empty too: the ray
        # has fewer than k+1 surviving candidates — a genuine miss.
        resolved = resolved | take | ~rec_k["hit"]
    return rec, ~resolved


def _trace_material_multihit(scene: FlatScene, tables: TraceTables, o, d,
                             t_min, t_max, cull_backface: bool,
                             max_alpha_retrace: int, k_hits: int):
    """Nearest hit honoring any-hit alpha testing via the K-nearest
    kernel (accel.pallas_traverse.trace_multihit_packet8): one traversal
    yields K exact-testable candidates, so the bounded re-trace loop
    fires only for rays whose K nearest candidates ALL reject (~the
    deep-canopy tail), instead of once per rejected layer."""
    from steeljax.accel import pallas_traverse as ptv
    from steeljax.accel.dispatch import BIG_CHUNK_ROWS, SUBLANES_BIG

    chunk = tables.chunks[0]
    subl = (SUBLANES_BIG if chunk.rows > BIG_CHUNK_ROWS
            else ptv.SUBLANES)
    count = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (count,))
    tmin0 = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (count,))

    def mtrace(o, d, tmn, tmx):
        return ptv.trace_multihit_packet8(
            chunk.bvh8, chunk.tris_packed, o, d, tmn, tmx,
            k_hits=k_hits, cull_backface=cull_backface,
            packet_sublanes=subl, alpha_mask=tables.alpha_masked,
            fine_mask_rows=chunk.fine_mask_rows)

    slots = mtrace(o, d, tmin0, tmax)
    rec, exhausted = _resolve_multihit(scene, tables, slots)
    t_last = slots["t"][k_hits - 1]

    # Exhausted rays are rare but scattered; compact them to the front
    # (same payload-sort rationale as the single-hit loop) so retrace
    # packets are dense and finished packets root-pop.
    compact = (_total_triangles(tables) > REPACK_MIN_TRIS
               and count >= 64 * 128)
    rec_keys = sorted(rec.keys())

    def _to_cols(rec):
        return [rec[k].astype(jnp.int32) if rec[k].dtype == bool
                else rec[k] for k in rec_keys]

    def _from_cols(cols, template):
        return {k: (c == 1) if template[k].dtype == bool else c
                for k, c in zip(rec_keys, cols)}

    slot = None
    if compact:
        lo, inv_extent = scene_bounds(tables)
        p = o + d * jnp.maximum(t_last, 0.0)[..., None]
        key = (((~exhausted).astype(jnp.int32) << 19)
               | _ray_sort_key(p, d, lo, inv_extent))
        slot = jnp.arange(count, dtype=jnp.int32)
        key, cols = repack_rays(
            key, [o, d, tmax, t_last, slot] + _to_cols(rec))
        o, d, tmax, t_last, slot = cols[:5]
        rec = _from_cols(cols[5:], rec)
        exhausted = (key >> 19) == 0

    def retrace_pass(state):
        rec, exhausted, t_last = state

        def do(args):
            rec, exhausted, t_last = args
            # Relative epsilon (ADVICE r3): absolute offsets vanish
            # below one fp32 ulp of far t values.
            new_tmin = t_last * (1.0 + 1e-4) + 1e-4
            slots2 = mtrace(o, d, new_tmin,
                            jnp.where(exhausted, tmax, RAY_DEAD_T))
            rec2, ex2 = _resolve_multihit(scene, tables, slots2)
            rec = {k: jnp.where(exhausted, rec2[k], rec[k]) for k in rec}
            t_last2 = jnp.where(exhausted, slots2["t"][k_hits - 1],
                                t_last)
            return rec, exhausted & ex2, t_last2

        return jax.lax.cond(jnp.any(exhausted), do, lambda s: s,
                            (rec, exhausted, t_last))

    for _ in range(max_alpha_retrace):
        rec, exhausted, t_last = retrace_pass((rec, exhausted, t_last))
    # Rays still exhausted after the bounded loop count as misses
    # (conservative vs the reference's unbounded any-hit walk).
    rec["hit"] = rec["hit"] & ~exhausted
    rec["tri"] = jnp.where(rec["hit"], rec["tri"], -1)
    rec["t"] = jnp.where(rec["hit"], rec["t"], -1.0)
    if compact:
        _, cols = repack_rays(slot, _to_cols(rec))
        rec = _from_cols(cols, rec)
    return rec


def trace_visibility(scene: FlatScene, tables: TraceTables, o, d,
                     t_min, t_max, max_alpha_retrace: int,
                     coherent: bool = False):
    """TraceVisibilityRay (RayGen.rgen:127-178): occlusion with alpha-test
    transparency, no backface culling.  Returns (N,) bool occluded."""
    from steeljax.accel.instances import (InstancedTables,
                                          trace_nearest_instanced)

    if not scene.any_alpha_test:
        if isinstance(tables, InstancedTables):
            return trace_nearest_instanced(
                tables, o, d, t_min, t_max, cull_backface=False,
                any_hit=True)["hit"]
        return trace_any(tables, scene.tri_pos, scene.tri_double_sided, o, d,
                         t_min, t_max, coherent=coherent)
    rec = trace_material_ray(scene, tables, o, d, t_min, t_max,
                             cull_backface=False,
                             max_alpha_retrace=max_alpha_retrace,
                             coherent=coherent)
    return rec["hit"]


def material_select(scene: FlatScene, mid):
    """Per-ray material constants WITHOUT a gather: a static chain of M
    selects over the (M, C) material tables.  TPU XLA gathers cost
    ~12 ns/index regardless of row width, so for the typical M (a few to
    a few dozen materials) M wide selects are 10-50x cheaper; scenes with
    >96 materials fall back to the gather.

    Returns (packed_row (N, 16), emission_linear (N, 3), tex_ids (N, 5)).
    """
    m = scene.mat_packed.shape[0]
    if m > 96:
        return (scene.mat_packed[mid], scene.mat_emission_linear[mid],
                scene.mat_tex[mid])
    packed = jnp.broadcast_to(scene.mat_packed[0],
                              mid.shape + (scene.mat_packed.shape[1],))
    em = jnp.broadcast_to(scene.mat_emission_linear[0], mid.shape + (3,))
    tex = jnp.broadcast_to(scene.mat_tex[0], mid.shape + (5,))
    for k in range(1, m):
        sel = (mid == k)[..., None]
        packed = jnp.where(sel, scene.mat_packed[k], packed)
        em = jnp.where(sel, scene.mat_emission_linear[k], em)
        if scene.has_textures:
            tex = jnp.where(sel, scene.mat_tex[k], tex)
    return packed, em, tex


def unpack_material_fused(scene: FlatScene, rec):
    """Surface + TBN from FUSED kernel shading outputs (rec carries the
    interpolated/normalized/backface-flipped normal, material id, and in
    textured scenes tangent + uv) — replaces the tri_shade row gather of
    unpack_material with a material select-chain (material_select)."""
    normal = rec["n"]
    mrow, emission, tex = material_select(scene, rec["mat"])

    base_color = mrow[:, 13:16]         # ToLinear(factor) precomputed
    roughness = mrow[:, 7]
    metallic = mrow[:, 8]

    tbn = brdf_lib.make_tbn(normal)
    if scene.has_textures:
        uv = rec["uv"]
        tangent = rec["tan"]

        def tex_rgb(idx):
            sample = sample_bilinear(scene.atlas, scene.tex_offset,
                                     scene.tex_size, idx, uv)
            return jnp.where((idx >= 0)[..., None], sample[..., :3], 1.0)

        n_idx = tex[:, 2]
        has_nm = n_idx >= 0
        ns = sample_bilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             n_idx, uv)[..., :3] * 2.0 - 1.0
        scale = mrow[:, 9]
        ns = _normalize(ns * jnp.stack(
            [scale, scale, jnp.ones_like(scale)], axis=-1))
        tbn_t = brdf_lib.make_tbn_with_tangent(normal, tangent)
        perturbed = _normalize(brdf_lib.tangent_to_world(ns, tbn_t))
        tbn_nm = brdf_lib.make_tbn(perturbed)
        tbn = tuple(
            jnp.where(has_nm[..., None], a, b) for a, b in zip(tbn_nm, tbn))

        base_color = to_linear(mrow[:, 0:3] * tex_rgb(tex[:, 0]))
        rm_idx = tex[:, 1]
        rm = sample_bilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             rm_idx, uv)
        roughness = roughness * jnp.where(rm_idx >= 0, rm[..., 1], 1.0)
        metallic = metallic * jnp.where(rm_idx >= 0, rm[..., 2], 1.0)
        emission = to_linear(mrow[:, 4:7] * tex_rgb(tex[:, 4]))

    surface = brdf_lib.make_surface(base_color, roughness, metallic,
                                    emission)
    return surface, tbn


def unpack_material(scene: FlatScene, rec, ray_d, shade=None):
    """ClosestHit attribute interpolation + UnpackMaterial
    (RayGen.rgen:72-115).  Returns (surface dict, tbn).

    EVERYTHING — vertex attributes AND the owning material's constants —
    comes from ONE packed row read (`shade`, tri_shade layout; defaults to
    the flattened scene's table); on TPU each additional small gather
    costs ~10 ms/Mray while one wide row gather is near bandwidth, so the
    material table is denormalized per triangle."""
    tri = jnp.maximum(rec["tri"], 0)
    u, v = rec["u"], rec["v"]

    if shade is None:
        shade = scene.tri_shade[tri]                 # (N, 56)
    w = (1.0 - u - v)[..., None]
    uw = u[..., None]
    vw = v[..., None]
    normal = _normalize(shade[:, 0:3] * w + shade[:, 3:6] * uw
                        + shade[:, 6:9] * vw)
    if scene.has_textures:
        tangent = _normalize(shade[:, 9:12] * w + shade[:, 12:15] * uw
                             + shade[:, 15:18] * vw)
        uv = (shade[:, 18:20] * w + shade[:, 20:22] * uw
              + shade[:, 22:24] * vw)
    else:
        # Tangents feed normal mapping and uvs feed texture fetches only.
        tangent = jnp.zeros_like(normal)
        uv = jnp.zeros(normal.shape[:-1] + (2,), normal.dtype)

    # Backface flip (ClosestHit.rchit:67-70): hit-kind is winding-based,
    # i.e. the Moller-Trumbore determinant sign.
    geom_n = shade[:, 24:27]
    backface = jnp.sum(geom_n * ray_d, axis=-1) > 0.0
    normal = jnp.where(backface[..., None], -normal, normal)

    def tex_rgb(slot_col, uv):
        idx = shade[:, slot_col].astype(jnp.int32)
        if not scene.has_textures:
            return jnp.ones(uv.shape[:-1] + (3,), jnp.float32), idx
        sample = sample_bilinear(scene.atlas, scene.tex_offset,
                                 scene.tex_size, idx, uv)
        return jnp.where((idx >= 0)[..., None], sample[..., :3], 1.0), idx

    # Normal mapping (RayGen.rgen:74-82): both frames are computed and the
    # per-lane choice is a select (lockstep SIMD, like the GPU's divergent
    # branch).  Skipped statically for untextured scenes.
    tbn = brdf_lib.make_tbn(normal)
    if scene.has_textures:
        n_idx = shade[:, 43].astype(jnp.int32)
        has_nm = n_idx >= 0
        ns = sample_bilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             n_idx, uv)[..., :3] * 2.0 - 1.0
        scale = shade[:, 39]
        ns = _normalize(ns * jnp.stack(
            [scale, scale, jnp.ones_like(scale)], axis=-1))
        tbn_t = brdf_lib.make_tbn_with_tangent(normal, tangent)
        perturbed = _normalize(brdf_lib.tangent_to_world(ns, tbn_t))
        tbn_nm = brdf_lib.make_tbn(perturbed)
        tbn = tuple(
            jnp.where(has_nm[..., None], a, b) for a, b in zip(tbn_nm, tbn))

    if scene.has_textures:
        base_rgb, _ = tex_rgb(41, uv)
        base_color = to_linear(shade[:, 46:49] * base_rgb)
    else:
        base_color = shade[:, 32:35]  # ToLinear(factor) precomputed

    if scene.has_textures:
        rm_idx = shade[:, 42].astype(jnp.int32)
        rm = sample_bilinear(scene.atlas, scene.tex_offset, scene.tex_size,
                             rm_idx, uv)
        rough_tex = jnp.where(rm_idx >= 0, rm[..., 1], 1.0)
        metal_tex = jnp.where(rm_idx >= 0, rm[..., 2], 1.0)
        roughness = shade[:, 36] * rough_tex
        metallic = shade[:, 37] * metal_tex
    else:
        roughness = shade[:, 36]
        metallic = shade[:, 37]

    if scene.has_textures:
        em_rgb, _ = tex_rgb(45, uv)
        emission = to_linear(shade[:, 49:52] * em_rgb)
    else:
        emission = shade[:, 29:32]

    surface = brdf_lib.make_surface(base_color, roughness, metallic, emission)
    return surface, tbn


# ---------------------------------------------------------------------------
# Next-event estimation (RayGen.rgen:180-305)
# ---------------------------------------------------------------------------

def _estimate_lights(scene: FlatScene, n, p):
    """Per-light irradiance estimate (EstimateLight, RayGen.rgen:180-197).
    Returns (N, L) for the first light_count lights."""
    loc = scene.light_location[:scene.light_count]          # (L, 4)
    color = scene.light_color[:scene.light_count, :3]       # (L, 3)
    direction = loc[None, :, :3] - p[:, None, :] * loc[None, :, 3:4]
    dist2 = jnp.sum(direction * direction, axis=-1)
    attenuation = jnp.where(loc[None, :, 3] == 0.0, 1.0,
                            jnp.where(dist2 == 0.0, 1e10, 1.0 / dist2))
    l = _normalize(direction)
    nol = jnp.maximum(jnp.sum(n[:, None, :] * l, axis=-1), 0.0)
    return attenuation * nol * luminance(color)[None, :]


def _light_distortion(n, w, seed):
    """ComputeLightDistortion (RayGen.rgen:251-266): disk/sphere jitter of
    the light direction for soft penumbrae."""
    u = jnp.stack([n[..., 1], -n[..., 0], jnp.zeros_like(n[..., 0])],
                  axis=-1)
    u_len = jnp.linalg.norm(u, axis=-1, keepdims=True)
    u = jnp.where(u_len > 1e-12, u / jnp.maximum(u_len, 1e-20),
                  jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    v = _normalize(jnp.cross(n, u))
    theta, seed = rng.next_float(seed)
    theta = theta * 2.0 * PI
    offset = jnp.cos(theta)[..., None] * u + jnp.sin(theta)[..., None] * v
    r, seed = rng.next_float(seed)
    d = jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
    offset = offset * r[..., None] + _normalize(n) * (d * w)[..., None]
    return offset, seed


def direct_lighting(scene: FlatScene, tables: TraceTables, surface, tbn,
                    p, wo, seed, max_alpha_retrace: int,
                    compose: str = "both"):
    """DirectLighting (RayGen.rgen:268-305).  Returns (radiance, seed).
    `compose` isolates the diffuse/specular BRDF term (ComposeBRDF,
    PathTracing.glsl:59)."""
    n = tbn[2]
    estimates = _estimate_lights(scene, n, p)            # (N, L)
    cum = jnp.cumsum(estimates, axis=-1)
    total = cum[:, -1]
    has_light = total > 0.0
    cum_norm = cum / jnp.maximum(total, 1e-20)[:, None]

    pick, seed = rng.next_float(seed)
    # First index with pick < cum_norm[i] (RayGen.rgen:226-234).
    light_index = jnp.sum(
        (pick[:, None] >= cum_norm[:, :-1]).astype(jnp.int32), axis=-1)
    # Select chains over the (static, <= MAX_LIGHT_COUNT) light axis: a
    # per-index gather even from a 16-row table costs ~10 ms per 2M rays
    # on TPU, a handful of fused selects is free.
    norm_est = estimates / jnp.maximum(total, 1e-20)[:, None]
    pdf = norm_est[:, 0]
    loc = jnp.broadcast_to(scene.light_location[0], p.shape[:1] + (4,))
    color = jnp.broadcast_to(scene.light_color[0, :3], p.shape[:1] + (3,))
    for i in range(1, scene.light_count):
        sel = light_index == i
        pdf = jnp.where(sel, norm_est[:, i], pdf)
        loc = jnp.where(sel[:, None], scene.light_location[i], loc)
        color = jnp.where(sel[:, None], scene.light_color[i, :3], color)
    is_point = loc[..., 3]

    direction = loc[..., :3] - p * is_point[..., None]
    distortion, seed = _light_distortion(-direction, is_point, seed)
    radius = jnp.where(is_point == 0.0, DIRECT_LIGHT_DISK_RADIUS,
                       POINT_LIGHT_RADIUS)
    direction = direction + distortion * radius[..., None]

    distance = jnp.where(is_point == 0.0, RAY_MAX_T,
                         jnp.linalg.norm(direction, axis=-1))
    attenuation = jnp.where(is_point == 0.0, 1.0,
                            1.0 / jnp.maximum(distance * distance, 1e-20))
    direction = _normalize(direction)

    wi = brdf_lib.world_to_tangent(direction, tbn)
    wh = _normalize(wo + wi)

    origin = p + n * BIAS
    # Shadow rays only where a light was actually picked (has_light zeroes
    # the contribution anyway): gated lanes get an inverted interval and
    # root-pop in the kernel, and the any-hit early exit counts them as
    # blocked.
    t_far = jnp.where(has_light, distance, RAY_DEAD_T)
    occluded = trace_visibility(scene, tables, origin, direction,
                                RAY_MIN_T, t_far, max_alpha_retrace)

    f = brdf_lib.evaluate_brdf(surface, wo, wi, wh, compose=compose)
    contrib = (f * brdf_lib.cos_theta(wi)[..., None] * color
               * (attenuation / jnp.maximum(pdf, 1e-20))[..., None])
    visible = has_light & ~occluded
    return jnp.where(visible[..., None], contrib, 0.0), seed


# ---------------------------------------------------------------------------
# The bounce loop (RayGen.rgen:322-412)
# ---------------------------------------------------------------------------

def trace_paths(scene: FlatScene, tables: TraceTables, o, d, seed,
                t_min, t_max, config: RenderConfig,
                primary_shared_origin: bool = False):
    """The bounce loop for a prepared ray batch (RayGen.rgen:344-407).

    Returns (irradiance (N, 3) clamped, seed, rays_traced scalar).  Shared
    by the frame renderer and the probe-capture path (ProbeRenderer)."""
    count = o.shape[0]
    rays_traced = jnp.zeros((), jnp.float32)  # segments + shadow rays

    if True:  # structured to mirror the per-sample body below
        irradiance = jnp.zeros((count, 3), jnp.float32)
        throughput = jnp.ones((count, 3), jnp.float32)
        ray_pdf = jnp.ones((count,), jnp.float32)
        alive = jnp.ones((count,), bool)
        t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (count,))
        t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (count,))
        # Deferred environment lookup: a lane misses at most once (it dies
        # at the miss) and its throughput / ray_pdf / direction freeze
        # there (every later update is alive-guarded), so the miss-time
        # env weight is recoverable at the END from the frozen state plus
        # one "ever missed" bit — one cubemap gather per sample instead of
        # per bounce, and no (weight, dir) arrays to carry.
        miss = jnp.zeros((count,), bool)

        # Before every secondary bounce on BIG scenes the in-flight ray
        # state is repacked by one stable payload sort (repack_rays):
        # dead rays sink to the tail (their packets root-pop for free —
        # wavefront compaction, SURVEY §7 M2) and the live block is
        # ordered by a (Morton origin cell, direction octant) key so
        # packets stop union-sweeping the whole tree.  Small scenes skip
        # it: the sort costs ~4 ms/bounce at 1M rays, more than their
        # entire union sweep (Cornell measured 95 vs 76 ms/frame).
        use_repack = _total_triangles(tables) > REPACK_MIN_TRIS
        # A/B knob (measurement, see CLAUDE.md): STEELJAX_REPACK=force
        # repacks small scenes with the full Morton key; =live repacks
        # with a liveness-only key — the stable sort then preserves tile
        # order inside the live block and only sinks dead lanes, probing
        # whether round 2's small-scene negative was the reorder, not
        # the sort.
        import os
        _repack_env = os.environ.get("STEELJAX_REPACK", "")
        live_key_only = _repack_env == "live"
        if _repack_env in ("force", "live"):
            use_repack = True
        sort_bounds = scene_bounds(tables) if use_repack else None
        repacked = False
        slot = jnp.arange(count, dtype=jnp.int32)
        for bounce in range(config.max_bounce_count):
            if bounce > 0 and use_repack:
                lo, inv_extent = sort_bounds
                key = (((~alive).astype(jnp.int32) << 19)
                       | (miss.astype(jnp.int32) << 18))
                if not live_key_only:
                    key = key | _ray_sort_key(o, d, lo, inv_extent)
                key, (o, d, throughput, ray_pdf, irradiance, seed,
                      slot) = repack_rays(
                    key, [o, d, throughput, ray_pdf, irradiance, seed,
                          slot])
                alive = (key >> 19) == 0
                miss = ((key >> 18) & 1) == 1
                t_max = jnp.where(alive, RAY_MAX_T, RAY_DEAD_T)
                repacked = True
            rays_traced = rays_traced + jnp.sum(alive.astype(jnp.float32))
            rec = trace_material_ray(
                scene, tables, o, d, t_min, t_max,
                cull_backface=config.backface_culling,
                max_alpha_retrace=config.max_alpha_retrace,
                # Pinhole primaries share one origin, which the kernel
                # exploits (scalar slab offsets + scalar Moller-Trumbore
                # q/t terms).  NOT true for batched probe captures
                # (capture_probes packs many probe origins in one call),
                # so the caller must opt in.
                shared_origin=(bounce == 0 and primary_shared_origin),
                # Tile-ordered primaries are screen-coherent: smaller
                # packets sweep ~half the leaf rows per ray on mid/large
                # scenes (dispatch.SUBLANES_COHERENT).
                coherent=(bounce == 0))

            weight = throughput / jnp.maximum(ray_pdf, 1e-30)[..., None]

            # Miss -> environment (RayGen.rgen:353-357), deferred.
            miss = miss | (alive & ~rec["hit"])

            alive = alive & rec["hit"]

            if "n" in rec:  # fused trace+shade kernel outputs
                surface, tbn = unpack_material_fused(scene, rec)
            else:
                surface, tbn = unpack_material(
                    scene, rec, d, shade_rows(scene, tables, rec))
            if config.override_material is not None:
                # DEBUG_OVERRIDE_MATERIAL (RayGen.rgen:99-102): force
                # roughness/metallic post-unpack; rebuild the derived
                # terms (f0/a/a2/sw) exactly as the reference's later
                # reads of surface.* see the overridden values.
                r_ov, m_ov = config.override_material
                surface = brdf_lib.make_surface(
                    surface["base_color"],
                    jnp.full_like(surface["roughness"], r_ov),
                    jnp.full_like(surface["metallic"], m_ov),
                    surface["emission"])

            # Emission (RayGen.rgen:361).
            irradiance = irradiance + jnp.where(
                alive[..., None], surface["emission"] * weight, 0.0)

            p = o + d * rec["t"][..., None]
            wo = brdf_lib.world_to_tangent(-d, tbn)
            wo = _normalize(wo)

            # NEE against punctual lights (RayGen.rgen:366-371).
            if scene.light_count > 0:
                rays_traced = rays_traced + jnp.sum(
                    alive.astype(jnp.float32))
                direct, seed = direct_lighting(
                    scene, tables, surface, tbn, p, wo, seed,
                    config.max_alpha_retrace,
                    compose=(config.debug_view
                             if config.debug_view in ("diffuse",
                                                      "specular")
                             else "both"))
                irradiance = irradiance + jnp.where(
                    alive[..., None], direct * weight, 0.0)

            # BRDF sample (RayGen.rgen:374-385).
            f, wi, pdf, seed = brdf_lib.sample_brdf(surface, wo, seed)
            black = jnp.sum(f * f, axis=-1) < EPSILON
            alive = alive & (pdf >= EPSILON) & ~black

            throughput = jnp.where(
                alive[..., None],
                throughput * f * brdf_lib.cos_theta(wi)[..., None],
                throughput)
            ray_pdf = jnp.where(alive, ray_pdf * pdf, ray_pdf)

            # Russian roulette (RayGen.rgen:387-395).
            if bounce >= config.min_bounce_count:
                threshold = jnp.maximum(
                    config.rr_min_threshold,
                    1.0 - jnp.max(throughput, axis=-1))
                r, seed = rng.next_float(seed)
                die = r < threshold
                alive = alive & ~die
                throughput = jnp.where(
                    alive[..., None],
                    throughput / jnp.maximum(1.0 - threshold, 1e-20)[..., None],
                    throughput)

            o = p
            # Guarded so a ray that missed this bounce keeps its traced
            # direction — that frozen d IS the deferred env lookup dir.
            d = jnp.where(alive[..., None],
                          brdf_lib.tangent_to_world(wi, tbn), d)
            t_min = jnp.full_like(t_min, RAY_MIN_T)
            # Dead lanes get an inverted interval: the traversal kernel
            # rejects them at the root slab test, so finished rays cost
            # packets nothing (the masked-lane analog of wavefront
            # compaction).
            t_max = jnp.where(alive, RAY_MAX_T, RAY_DEAD_T)

    # Deferred env: throughput/ray_pdf/d froze at the miss bounce, so this
    # reproduces the per-bounce miss shading exactly (RayGen.rgen:353-357).
    env_weight = jnp.where(
        miss[..., None], throughput / jnp.maximum(ray_pdf, 1e-30)[..., None],
        0.0)
    if scene.env_analytic:
        # Procedural-sky scenes evaluate the closed form directly: the
        # TPU gather costs ~10 ms per M indices regardless of table size,
        # the ~20 elementwise ops fuse into the frame for free (and skip
        # the cubemap's resolution/bilinear discretization).
        from steeljax.env.sky import sky_radiance
        env_radiance = sky_radiance(d)
    else:
        env_radiance = sample_cube_quads(scene.env_quads, d)
    irradiance = irradiance + env_radiance * env_weight
    clamped = jnp.minimum(irradiance, config.max_irradiance)
    if repacked:
        # Restore frame order: `slot` is a permutation, so one sort by it
        # puts every ray's accumulated irradiance (and seed, for the
        # caller's next sample) back at its pixel.
        _, (clamped, seed) = repack_rays(slot, [clamped, seed])
    return clamped, seed, rays_traced


@functools.partial(
    jax.jit, static_argnames=("width", "height", "config", "render_to_cube",
                              "return_stats"))
def render_pixels(scene: FlatScene, tables: TraceTables,
                  inverse_view, inverse_proj,
                  camera_near, camera_far, width: int, height: int,
                  px, py, accumulation_index, sample_index,
                  config: RenderConfig = RenderConfig(),
                  render_to_cube: bool = False,
                  return_stats: bool = False):
    """One path-traced irradiance sample for each pixel in (px, py);
    returns (N, 3) float32 linear (pre-tonemap, clamped).

    This is the sharding granule: px/py may be laid out across a device
    mesh (pure data parallelism over pixels — the TPU analog of
    traceRaysKHR(W, H), SURVEY.md §2.7)."""
    count = px.shape[0]
    total = jnp.zeros((count, 3), jnp.float32)
    rays_traced = jnp.zeros((), jnp.float32)

    for s in range(config.sample_count):
        seed = rng.make_seed(px.astype(jnp.uint32), py.astype(jnp.uint32),
                             jnp.uint32(s) + jnp.uint32(sample_index),
                             jnp.asarray(accumulation_index, jnp.uint32))
        o, d, seed = primary_rays(inverse_view, inverse_proj, width, height,
                                  px, py, seed, render_to_cube)
        sample, seed, rays = trace_paths(
            scene, tables, o, d, seed, camera_near, camera_far, config,
            # primary_rays broadcasts ONE camera/probe position in both
            # perspective and cube modes.
            primary_shared_origin=True)
        total = total + sample
        rays_traced = rays_traced + rays

    result = total / config.sample_count
    if return_stats:
        return result, {"rays_traced": rays_traced}
    return result


@functools.lru_cache(maxsize=32)
def tiled_order(width: int, height: int):
    """Pixel traversal order grouping rays into screen tiles so traversal
    packets are spatially compact (the ThreadGroupTiling analog,
    ThreadGroupTiling.glsl:19-70): a 4096-ray packet covers a 64x16 block
    instead of a 1280x3 strip, shrinking the BVH node set it touches.
    Returns (px, py, (tile_w, tile_h)) or None when the extent doesn't
    tile; undo the ordering with `detile` (a reshape/transpose — a 2M-
    index gather for the same job costs ~25 ms on TPU at 1080p)."""
    for tw, th in ((64, 16), (128, 8), (32, 16), (16, 16)):
        if width % tw == 0 and height % th == 0:
            idx = np.arange(width * height, dtype=np.int32).reshape(
                height, width)
            order = idx.reshape(height // th, th, width // tw,
                                tw).transpose(0, 2, 1, 3).reshape(-1)
            return (jnp.asarray(order % width), jnp.asarray(order // width),
                    (tw, th))
    return None


@functools.partial(jax.jit, static_argnames=("width", "height", "tile"))
def detile(result, width: int, height: int, tile):
    """Invert tiled_order's pixel ordering: (W*H, C) tile-ordered ->
    (H, W, C) row-major, as pure reshape/transpose (no gather)."""
    tw, th = tile
    c = result.shape[1:]
    r = result.reshape((height // th, width // tw, th, tw) + c)
    return r.transpose(0, 2, 1, 3, *range(4, 4 + len(c))).reshape(
        (height, width) + c)


def render_sample(scene: FlatScene, tables: TraceTables,
                  inverse_view, inverse_proj,
                  camera_near, camera_far, width: int, height: int,
                  accumulation_index, sample_index,
                  config: RenderConfig = RenderConfig(),
                  render_to_cube: bool = False):
    """Full-frame convenience wrapper around render_pixels; (H, W, 3)."""
    tiled = tiled_order(width, height)
    if tiled is not None:
        px, py, tile = tiled
        result = render_pixels(
            scene, tables, inverse_view, inverse_proj, camera_near,
            camera_far, width, height, px, py,
            accumulation_index, sample_index, config, render_to_cube)
        return detile(result, width, height, tile)
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.int32),
                          jnp.arange(width, dtype=jnp.int32), indexing="ij")
    result = render_pixels(
        scene, tables, inverse_view, inverse_proj, camera_near, camera_far,
        width, height, xs.reshape(-1), ys.reshape(-1),
        accumulation_index, sample_index, config, render_to_cube)
    return result.reshape(height, width, 3)
