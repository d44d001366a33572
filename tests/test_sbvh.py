"""Native builder: all-axis object SAH + SBVH spatial splits.

The reference gets driver-built ePreferFastTrace acceleration
structures (AccelerationStructureManager.cpp:8-17); steeljax builds its
own.  These tests pin the builder contracts on CPU:

* object builds return a strict permutation; SBVH builds return a
  REFERENCE list (duplicates allowed, bounded by the 1.5x budget);
* every source triangle is covered by at least one leaf;
* leaf ranges are row-aligned and disjoint after _align_leaves;
* traces through an SBVH tree agree with the object-SAH tree and with
  brute force (nearest t identical — duplicated refs carry identical
  geometry).
"""

from __future__ import annotations

import numpy as np
import pytest

from steeljax.accel import traverse
from steeljax.accel.bvh import BVH, TRI_PER_ROW, build_bvh
from steeljax.native import build_bvh_sah


def _soup(n, seed, long_tris=False):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    s1 = 3.0 if long_tris else 0.4
    e1 = rng.normal(0, s1, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    return np.stack([c, c + e1, c + e2], axis=1)


@pytest.fixture(scope="module")
def native_available():
    if build_bvh_sah(_soup(4, 0), 24) is None:
        pytest.skip("native builder unavailable")


def _validate_nodes(nodes, refs, n_tris, max_leaf):
    covered = np.zeros(n_tris, bool)
    owned = np.zeros(len(refs), np.int32)
    stack = [0]
    while stack:
        i = stack.pop()
        lo, hi = nodes[i, 0:3], nodes[i, 3:6]
        m0, m1 = nodes[i, 6], nodes[i, 7]
        assert (lo <= hi + 1e-5).all()
        if m1 > 0:
            s, c = int(m0), int(m1)
            assert 0 < c <= max_leaf
            assert 0 <= s and s + c <= len(refs)
            owned[s:s + c] += 1
            covered[refs[s:s + c]] = True
        else:
            left = int(m0)
            for ch in (left, left + 1):
                clo, chi = nodes[ch, 0:3], nodes[ch, 3:6]
                if (clo <= chi).all():  # empty boxes allowed for pads
                    assert (clo >= lo - 1e-4).all()
                    assert (chi <= hi + 1e-4).all()
                stack.append(ch)
    assert covered.all(), "source triangle lost"
    assert (owned == 1).all(), "ref slot multiply-owned or orphaned"


def test_object_build_is_permutation(native_available):
    tris = _soup(5000, 1)
    nodes, refs, depth = build_bvh_sah(tris, 24, spatial_alpha=0.0)
    assert sorted(refs.tolist()) == list(range(len(tris)))
    _validate_nodes(nodes, refs, len(tris), 24)


def test_sbvh_build_duplicates_bounded(native_available):
    tris = _soup(5000, 2, long_tris=True)
    nodes, refs, depth = build_bvh_sah(tris, 24, spatial_alpha=1e-5)
    assert len(refs) >= len(tris)
    assert len(refs) <= int(len(tris) * 1.5) + 16  # duplication budget
    _validate_nodes(nodes, refs, len(tris), 24)
    # Long thin triangles MUST trigger some splitting on this soup.
    assert len(refs) > len(tris)


def test_sbvh_improves_or_matches_row_cost(native_available):
    """On the long-thin soup (the SBVH textbook case) spatial splits
    must reduce the area-weighted leaf-row cost vs object SAH."""
    tris = _soup(8000, 3, long_tris=True)

    def row_cost(nodes):
        d = np.maximum(nodes[:, 3:6] - nodes[:, 0:3], 0)
        area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
        leaf = nodes[:, 7] > 0
        rows = np.ceil(nodes[:, 7] / TRI_PER_ROW)
        return float((area[leaf] * rows[leaf]).sum() / area[0])

    obj_nodes, _, _ = build_bvh_sah(tris, 24, spatial_alpha=0.0)
    sb_nodes, _, _ = build_bvh_sah(tris, 24, spatial_alpha=1e-5)
    assert row_cost(sb_nodes) < row_cost(obj_nodes)


def _trace(tris, method, o, d):
    import jax.numpy as jnp
    bvh, order, padded = build_bvh(tris, leaf_size=24, method=method)
    pos = np.full((padded, 3, 3), 3.0e37, np.float32)
    real = order >= 0
    pos[np.nonzero(real)[0]] = tris[order[real]]
    ds = np.zeros(padded, bool)
    return traverse.trace_nearest(bvh, jnp.asarray(pos), jnp.asarray(ds),
                                  o, d, 1e-3, 1e9, cull_backface=False)


def test_sbvh_trace_matches_object_and_bruteforce(native_available):
    import jax.numpy as jnp
    tris = _soup(3000, 4, long_tris=True)
    rng = np.random.default_rng(5)
    m = 500
    o = jnp.asarray(rng.uniform(-12, 12, (m, 3)).astype(np.float32))
    dirs = rng.normal(size=(m, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    d = jnp.asarray(dirs)

    rec_obj = _trace(tris, "sah", o, d)
    rec_sb = _trace(tris, "sbvh", o, d)
    ho = np.asarray(rec_obj["hit"])
    hs = np.asarray(rec_sb["hit"])
    assert (ho == hs).all()
    both = ho & hs
    dt = np.abs(np.asarray(rec_obj["t"])[both]
                - np.asarray(rec_sb["t"])[both])
    assert dt.max() == 0.0  # same triangles, same Moller-Trumbore

    # Row alignment after build_bvh (which routes through _align_leaves).
    bvh, order, padded = build_bvh(tris, leaf_size=24, method="sbvh")
    nodes = np.asarray(bvh.nodes)
    leaf = nodes[:, 7] > 0
    assert (nodes[leaf, 6].astype(np.int64) % TRI_PER_ROW == 0).all()
    # Reference-list completeness: every triangle appears >= 1 time.
    real = order[order >= 0]
    assert np.isin(np.arange(len(tris)), real).all()
