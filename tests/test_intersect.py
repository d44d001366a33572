"""Moller-Trumbore and BVH traversal correctness."""

import numpy as np
import jax.numpy as jnp

from steeljax.accel import (apply_permutation, build_bvh, trace_any,
                            trace_nearest, trace_nearest_brute)
from steeljax.accel.intersect import intersect


def _tri(v0, v1, v2):
    v0, v1, v2 = (np.asarray(v, np.float32) for v in (v0, v1, v2))
    return v0[None], (v1 - v0)[None], (v2 - v0)[None]


def test_hit_frontface():
    v0, e1, e2 = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    t, u, v, hit = intersect(
        jnp.asarray([0.0, 0.0, 5.0]), jnp.asarray([0.0, 0.0, -1.0]),
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        jnp.asarray([False]), 0.001, 100.0, cull_backface=True)
    assert bool(hit[0])
    assert abs(float(t[0]) - 5.0) < 1e-5


def test_backface_culled_unless_double_sided():
    # Same triangle seen from behind (ray travels +Z).
    v0, e1, e2 = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    args = (jnp.asarray([0.0, 0.0, -5.0]), jnp.asarray([0.0, 0.0, 1.0]),
            jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))
    _, _, _, hit = intersect(*args, jnp.asarray([False]), 0.001, 100.0,
                             cull_backface=True)
    assert not bool(hit[0])
    _, _, _, hit = intersect(*args, jnp.asarray([True]), 0.001, 100.0,
                             cull_backface=True)
    assert bool(hit[0])
    _, _, _, hit = intersect(*args, jnp.asarray([False]), 0.001, 100.0,
                             cull_backface=False)
    assert bool(hit[0])


def test_barycentrics_match_hit_point():
    v0 = np.array([0, 0, 0], np.float32)
    v1 = np.array([2, 0, 0], np.float32)
    v2 = np.array([0, 2, 0], np.float32)
    t, u, v, hit = intersect(
        jnp.asarray([0.5, 0.5, 3.0]), jnp.asarray([0.0, 0.0, -1.0]),
        jnp.asarray(v0[None]), jnp.asarray((v1 - v0)[None]),
        jnp.asarray((v2 - v0)[None]), jnp.asarray([False]),
        0.001, 100.0, cull_backface=False)
    assert bool(hit[0])
    point = v0 + float(u[0]) * (v1 - v0) + float(v[0]) * (v2 - v0)
    np.testing.assert_allclose(point[:2], [0.5, 0.5], atol=1e-5)


def test_miss_outside_and_range():
    v0, e1, e2 = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    args = (jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray([False]))
    _, _, _, hit = intersect(jnp.asarray([5.0, 5.0, 5.0]),
                             jnp.asarray([0.0, 0.0, -1.0]), *args,
                             0.001, 100.0, cull_backface=False)
    assert not bool(hit[0])
    _, _, _, hit = intersect(jnp.asarray([0.0, 0.0, 5.0]),
                             jnp.asarray([0.0, 0.0, -1.0]), *args,
                             0.001, 2.0, cull_backface=False)
    assert not bool(hit[0])  # hit at t=5 beyond t_max=2


def _random_soup(n, seed):
    r = np.random.default_rng(seed)
    centers = r.uniform(-10, 10, (n, 1, 3))
    tris = centers + r.normal(0, 0.7, (n, 3, 3))
    return tris.astype(np.float32)


def test_bvh_matches_brute_force():
    tris = _random_soup(700, 1)
    ds = np.ones(len(tris), bool)
    result = build_bvh(tris, leaf_size=4)
    perm = apply_permutation(result, {"p": tris, "d": ds})
    bvh = result[0]
    tp, tds = jnp.asarray(perm["p"]), jnp.asarray(perm["d"])

    r = np.random.default_rng(2)
    n = 256
    o = r.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    a = trace_nearest(bvh, tp, tds, jnp.asarray(o), jnp.asarray(d),
                      0.001, 1000.0, cull_backface=False)
    b = trace_nearest_brute(tp, tds, jnp.asarray(o), jnp.asarray(d),
                            0.001, 1000.0, cull_backface=False)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-4)


def test_trace_any_consistent_with_nearest():
    tris = _random_soup(300, 3)
    ds = np.zeros(len(tris), bool)
    result = build_bvh(tris, leaf_size=4)
    perm = apply_permutation(result, {"p": tris, "d": ds})
    bvh = result[0]
    tp, tds = jnp.asarray(perm["p"]), jnp.asarray(perm["d"])

    r = np.random.default_rng(4)
    n = 128
    o = r.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    occluded = np.asarray(trace_any(bvh, tp, tds, jnp.asarray(o),
                                    jnp.asarray(d), 0.001, 1000.0))
    nearest = np.asarray(trace_nearest(
        bvh, tp, tds, jnp.asarray(o), jnp.asarray(d), 0.001, 1000.0,
        cull_backface=False)["hit"])
    np.testing.assert_array_equal(occluded, nearest)


def test_empty_scene():
    tris = np.zeros((0, 3, 3), np.float32)
    result = build_bvh(tris)
    bvh = result[0]
    perm = apply_permutation(result, {"p": tris, "d": np.zeros(0, bool)})
    rec = trace_nearest(bvh, jnp.asarray(perm["p"]), jnp.asarray(perm["d"]),
                        jnp.zeros((4, 3)), jnp.asarray([[0.0, 0.0, 1.0]] * 4),
                        0.001, 1000.0)
    assert not bool(np.asarray(rec["hit"]).any())


def test_sah_aligned_leaves_match_brute_force():
    """Regression: the SAH builder's 8-aligned leaf layout must not lose
    hits at array boundaries (the last leaf's fixed-size read needs pad
    slack)."""
    from steeljax.scene.builtin import make_cornell_scene
    from steeljax.scene.flatten import flatten_scene

    scene = make_cornell_scene(sphere_detail=6)
    flat = flatten_scene(scene)
    tris = np.asarray(flat.tri_pos)
    ds = np.asarray(flat.tri_double_sided)
    result = build_bvh(tris, leaf_size=24, method="auto")
    perm = apply_permutation(result, {"p": tris, "d": ds})
    bvh = result[0]
    tp, tds = jnp.asarray(perm["p"]), jnp.asarray(perm["d"])

    r = np.random.default_rng(5)
    n = 512
    o = r.uniform(-4.5, 4.5, (n, 3)).astype(np.float32)  # inside the box
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    a = trace_nearest(bvh, tp, tds, jnp.asarray(o), jnp.asarray(d),
                      0.001, 1000.0, cull_backface=False)
    b = trace_nearest_brute(tp, tds, jnp.asarray(o), jnp.asarray(d),
                            0.001, 1000.0, cull_backface=False)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-4)


def test_morton_builder_alignment_and_coverage():
    """The Morton fallback builder must honor the same row-alignment
    contract as the SAH path (_align_leaves): leaf starts at multiples of
    TRI_PER_ROW, the permutation covers every input exactly once, and the
    structural validator passes (ADVICE r3 — untested fallback)."""
    from steeljax.accel.bvh import TRI_PER_ROW
    from steeljax.core.validate import validate_bvh

    rng = np.random.default_rng(9)
    for count in (1, 7, 12, 100, 1333):
        base = rng.uniform(-5, 5, (count, 1, 3)).astype(np.float32)
        tris = (base + rng.normal(0, 0.3, (count, 3, 3))).astype(np.float32)
        bvh, order, padded = build_bvh(tris, leaf_size=8, method="morton")
        assert padded % TRI_PER_ROW == 0
        assert len(order) == padded
        real = order[order >= 0]
        assert len(real) == count, "permutation must cover every triangle"
        assert len(np.unique(real)) == count, "permutation has duplicates"
        nodes = np.asarray(bvh.nodes)
        leaf = nodes[:, 7] > 0
        starts = nodes[leaf, 6].astype(np.int64)
        assert (starts % TRI_PER_ROW == 0).all(), "unaligned morton leaf"
        validate_bvh(bvh, padded)

        # The aligned tree still answers queries exactly (vs brute force).
        perm = apply_permutation((None, order, padded), {"tri_pos": tris})
        ds = np.zeros(padded, bool)
        o = jnp.asarray(rng.uniform(-6, 6, (64, 3)).astype(np.float32))
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = jnp.asarray(d)
        got = trace_nearest(bvh, jnp.asarray(perm["tri_pos"]),
                            jnp.asarray(ds), o, d, 0.001, 100.0,
                            cull_backface=False)
        want = trace_nearest_brute(jnp.asarray(perm["tri_pos"]),
                                   jnp.asarray(ds), o, d, 0.001, 100.0,
                                   cull_backface=False)
        np.testing.assert_allclose(np.asarray(got["t"]),
                                   np.asarray(want["t"]), atol=1e-4)
