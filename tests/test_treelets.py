"""Streamed-treelet traversal: cut invariants + scheduler correctness.

The Pallas round kernel itself is TPU-only (like the other traversal
kernels); CI covers the builder's layout contracts in numpy and runs the
FULL scheduling loop (binning, per-packet treelet choice, round
iteration, best-hit merging, visited masking) against a brute-force
reference by injecting a mock intersector for the kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from steeljax.accel.bvh import (TRI_PER_ROW, build_bvh,
                                subtree_tri_ranges)
from steeljax.accel.pallas_traverse import LANES, pack_tris
from steeljax.accel.treelets import (build_treelet_tables, cut_treelets,
                                     trace_treelets)

LEAF = 8
MAX_TRIS = 256


def _soup(count, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (count, 1, 3)).astype(np.float32)
    return base + rng.uniform(-0.4, 0.4, (count, 3, 3)).astype(np.float32)


@pytest.fixture(scope="module")
def built():
    tri = _soup(3000)
    bvh, order, padded = build_bvh(tri, LEAF, method="sah")
    permuted = np.full((padded, 3, 3), 3.0e37, np.float32)
    real = order >= 0
    permuted[np.nonzero(real)[0]] = tri[order[real]]
    packed = pack_tris(permuted, np.zeros(padded, bool))
    tt = build_treelet_tables(np.asarray(bvh.nodes), packed, LEAF,
                              max_tris=MAX_TRIS)
    return bvh, permuted, tt


def test_cut_tiles_triangle_rows(built):
    """Treelet ranges are disjoint, ascending, row-aligned, and tile
    the padded layout up to the builder's end slack."""
    bvh, permuted, tt = built
    nodes = np.asarray(bvh.nodes)
    count, lo, hi = subtree_tri_ranges(nodes)
    roots, rlo, rhi = cut_treelets(nodes, MAX_TRIS)
    assert (count[roots] <= MAX_TRIS).all()
    assert rlo[0] == 0
    assert (rlo % TRI_PER_ROW == 0).all() \
        and (rhi % TRI_PER_ROW == 0).all()
    np.testing.assert_array_equal(rlo[1:], rhi[:-1])
    # Root subtree == union of treelets == everything below the slack.
    assert rhi[-1] == hi[0] and rlo[0] == lo[0]
    assert sum(count[roots]) == count[0]


def test_tables_layout(built):
    bvh, permuted, tt = built
    k = tt.count
    assert tt.node_stack.shape[0] == k and tt.tri_stack.shape[0] == k
    assert tuple(np.asarray(tt.tri_offsets)) == tuple(
        lo for lo, _ in tt.ranges)
    # Treelet AABBs contain their triangles.
    for i, (lo, hi) in enumerate(tt.ranges):
        tris = permuted[lo:hi].reshape(-1, 3)
        tris = tris[tris[:, 0] < 1e37]
        assert (tris >= np.asarray(tt.aabb_lo)[i] - 1e-4).all()
        assert (tris <= np.asarray(tt.aabb_hi)[i] + 1e-4).all()
    # Local leaf starts stay inside each treelet's row span.
    rows = np.asarray(tt.node_stack)
    starts = rows[:, :, 6::16]
    counts = rows[:, :, 7::16]
    leaf = counts > 0
    r = tt.tri_stack.shape[1]
    assert (starts[leaf] >= 0).all()
    assert (starts[leaf] + counts[leaf] <= r * TRI_PER_ROW).all()


def _mock_trace(permuted, tt, block):
    """Brute-force per-packet intersector with the round kernel's
    signature: (pid, o, d, t_min, t_max) -> treelet-LOCAL record."""
    r8 = tt.tri_stack.shape[1] * TRI_PER_ROW
    tri_dev = jnp.asarray(
        np.concatenate([permuted,
                        np.full((r8, 3, 3), 3.0e37, np.float32)]))
    offsets = tt.tri_offsets

    def one_packet(pid, o, d, tmn, tmx):
        tris = jax.lax.dynamic_slice(
            tri_dev, (offsets[pid], 0, 0), (r8, 3, 3))
        v0 = tris[:, 0]
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        p = jnp.cross(d[:, None, :], e2[None])
        det = jnp.sum(e1[None] * p, axis=-1)
        facing = det > 1e-12  # cull_backface, single-sided soup
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
        tv = o[:, None, :] - v0[None]
        u = jnp.sum(tv * p, axis=-1) * inv
        q = jnp.cross(tv, e1[None])
        v = jnp.sum(d[:, None, :] * q, axis=-1) * inv
        t = jnp.sum(e2[None] * q, axis=-1) * inv
        ok = (facing & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t >= tmn[:, None]) & (t <= tmx[:, None]))
        t = jnp.where(ok, t, jnp.inf)
        best = jnp.argmin(t, axis=1)
        bt = jnp.take_along_axis(t, best[:, None], 1)[:, 0]
        hit = jnp.isfinite(bt)
        return {"t": jnp.where(hit, bt, -1.0),
                "tri": jnp.where(hit, best.astype(jnp.int32), -1),
                "u": jnp.zeros_like(bt), "v": jnp.zeros_like(bt),
                "hit": hit}

    def trace(pid, o, d, tmn, tmx):
        rec = jax.vmap(one_packet)(
            pid, o.reshape((-1, block, 3)), d.reshape((-1, block, 3)),
            tmn.reshape((-1, block)), tmx.reshape((-1, block)))
        return {k: v.reshape(-1) for k, v in rec.items()}

    return trace


def _reference(permuted, o, d, tmn, tmx):
    v0 = permuted[:, 0]
    e1 = permuted[:, 1] - permuted[:, 0]
    e2 = permuted[:, 2] - permuted[:, 0]
    p = np.cross(d[:, None, :], e2[None])
    det = np.einsum("tj,rtj->rt", e1, p)
    facing = det > 1e-12
    inv = 1.0 / np.where(np.abs(det) > 1e-12, det, 1.0)
    tv = o[:, None, :] - v0[None]
    u = np.sum(tv * p, axis=-1) * inv
    q = np.cross(tv, e1[None])
    v = np.einsum("rj,rtj->rt", d, q)
    v = v * inv
    t = np.einsum("tj,rtj->rt", e2, q) * inv
    ok = (facing & (u >= 0) & (v >= 0) & (u + v <= 1)
          & (t >= tmn[:, None]) & (t <= tmx[:, None]))
    t = np.where(ok, t, np.inf)
    best = t.min(axis=1)
    return np.where(np.isfinite(best), best, -1.0)


def test_scheduler_matches_bruteforce(built):
    """The full round loop (entry binning, packet choice, merge) must
    equal a global brute-force nearest hit, with rays crossing many
    treelets."""
    bvh, permuted, tt = built
    rng = np.random.default_rng(7)
    n = 700  # deliberately not a packet multiple (pad-lane coverage)
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    subl = 2
    block = LANES * subl
    rec = trace_treelets(tt, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4,
                         cull_backface=True, packet_sublanes=subl,
                         trace_fn=_mock_trace(permuted, tt, block))
    t_ref = _reference(permuted, o, d, np.full(n, 1e-3, np.float32),
                       np.full(n, 1e4, np.float32))
    hit_ref = t_ref >= 0
    np.testing.assert_array_equal(np.asarray(rec["hit"]), hit_ref)
    np.testing.assert_allclose(np.asarray(rec["t"])[hit_ref],
                               t_ref[hit_ref], rtol=1e-5, atol=1e-5)
    # Global ids point at the true winning triangle.
    tri = np.asarray(rec["tri"])[hit_ref]
    assert (tri >= 0).all() and (tri < len(permuted)).all()


def test_scheduler_any_hit(built):
    bvh, permuted, tt = built
    rng = np.random.default_rng(11)
    n = 512
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    subl = 2
    block = LANES * subl
    rec = trace_treelets(tt, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4,
                         cull_backface=True, any_hit=True,
                         packet_sublanes=subl,
                         trace_fn=_mock_trace(permuted, tt, block))
    t_ref = _reference(permuted, o, d, np.full(n, 1e-3, np.float32),
                       np.full(n, 1e4, np.float32))
    np.testing.assert_array_equal(np.asarray(rec["hit"]), t_ref >= 0)


def test_prepare_tables_treelet_optin():
    """prepare_tables(treelets=True) builds streamed-treelet tables (one
    metadata chunk, stacked treelet tables) and attach_shade_tables routes
    to the treelet shade stack."""
    from steeljax.accel.dispatch import attach_shade_tables, prepare_tables

    tri = _soup(2000, seed=3)
    tables, order, padded = prepare_tables(
        tri, np.zeros(len(tri), bool), leaf_size=LEAF,
        use_pallas=True, treelets=True)
    assert tables.treelets is not None
    assert len(tables.chunks) == 1
    assert tables.chunks[0].tris_packed is None  # metadata only
    assert tables.chunks[0].rows == padded
    # Permutation covers every real triangle exactly once.
    real = order[order >= 0]
    assert sorted(real) == list(range(len(tri)))

    nrm = np.tile(np.float32([0, 0, 1]), (padded, 3, 1))
    tan = np.tile(np.float32([1, 0, 0]), (padded, 3, 1))
    uv = np.zeros((padded, 3, 2), np.float32)
    mat = np.zeros(padded, np.int32)
    shaded = attach_shade_tables(tables, nrm, tan, uv, mat, textured=False)
    assert shaded.shade_mode == 1
    assert shaded.treelets.shade_stack is not None
    per_rows = shaded.treelets.tri_stack.shape[1]
    assert shaded.treelets.shade_stack.shape[1] == per_rows

    # Default build must NOT take the treelet path.
    default_tables, _, _ = prepare_tables(
        tri, np.zeros(len(tri), bool), leaf_size=LEAF, use_pallas=True)
    assert default_tables.treelets is None


def test_shade_attach_respects_vmem_budget(monkeypatch):
    """Oversized treelets keep the post-trace gather path instead of
    attaching a fused shade stack that would spill the VMEM pipeline."""
    from steeljax.accel import dispatch
    from steeljax.accel.dispatch import attach_shade_tables, prepare_tables

    tri = _soup(2000, seed=5)
    tables, order, padded = prepare_tables(
        tri, np.zeros(len(tri), bool), leaf_size=LEAF,
        use_pallas=True, treelets=True)
    nrm = np.tile(np.float32([0, 0, 1]), (padded, 3, 1))
    tan = np.tile(np.float32([1, 0, 0]), (padded, 3, 1))
    uv = np.zeros((padded, 3, 2), np.float32)
    mat = np.zeros(padded, np.int32)

    monkeypatch.setattr(dispatch, "TREELET_SHADE_VMEM_BUDGET", 1)
    shaded = attach_shade_tables(tables, nrm, tan, uv, mat, textured=False)
    assert shaded.shade_mode == 0
    assert shaded.treelets.shade_stack is None


def test_many_treelet_cut_loses_no_hits(built):
    """Regression: the round loop must run to completion for ANY treelet
    count (a fixed 64-round backstop silently dropped hits at K=174)."""
    bvh, permuted, tt_unused = built
    packed = pack_tris(permuted, np.zeros(len(permuted), bool))
    tt = build_treelet_tables(np.asarray(bvh.nodes), packed, LEAF,
                              max_tris=24)
    assert tt.count > 64, "cut must exceed the old round backstop"

    rng = np.random.default_rng(19)
    n = 512
    o = rng.uniform(-14, 14, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    subl = 2
    block = LANES * subl
    rec = trace_treelets(tt, jnp.asarray(o), jnp.asarray(d), 1e-3, 1e4,
                         cull_backface=True, packet_sublanes=subl,
                         trace_fn=_mock_trace(permuted, tt, block))
    t_ref = _reference(permuted, o, d, np.full(n, 1e-3, np.float32),
                       np.full(n, 1e4, np.float32))
    hit_ref = t_ref >= 0
    np.testing.assert_array_equal(np.asarray(rec["hit"]), hit_ref)
    np.testing.assert_allclose(np.asarray(rec["t"])[hit_ref],
                               t_ref[hit_ref], rtol=1e-5, atol=1e-5)
