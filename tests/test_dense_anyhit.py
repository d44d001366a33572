"""Dense 14-record any-hit tables (pack_tris_dense + re-aligned leaves).

The occlusion-query record is [v0, e1, e2] — no ds/aux lane — so 14
records fit a 128-lane row (126 lanes) instead of 12: 14.3% fewer
shadow leaf-row visits, exactly (no quantization).  These tests pin the
host-side layout contracts; the kernel itself is covered by the on-TPU
parity variant flat_anyhit_dense (apps/kernel_parity.py).
"""

from __future__ import annotations

import numpy as np

from steeljax.accel import pallas_traverse as ptv
from steeljax.accel.dispatch import prepare_tables


def _soup(n, seed):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.6, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.6, (n, 3)).astype(np.float32)
    return np.stack([c, c + e1, c + e2], axis=1)


def _unpack_dense(rows):
    """Invert pack_tris_dense: rows (R, 128) -> (R*14, 3, 3) triangles."""
    rows = np.asarray(rows)
    recs = rows[:, :ptv.DENSE_PER_ROW * ptv.DENSE_STRIDE].reshape(
        -1, ptv.DENSE_STRIDE)
    v0 = recs[:, 0:3]
    tris = np.stack([v0, v0 + recs[:, 3:6], v0 + recs[:, 6:9]], axis=1)
    return tris


def _walk_leaves(rows, width):
    """All (start_row, count) leaf entries reachable from supernode 0."""
    rows = np.asarray(rows)
    stride = 128 // width
    leaves = []
    stack = [0]
    seen = set()
    while stack:
        sid = stack.pop()
        assert sid not in seen
        seen.add(sid)
        row = rows[sid]
        for c in range(width):
            off = stride * c
            m0, m1 = row[off + 6], row[off + 7]
            if m0 < 0:
                continue
            if m1 > 0:
                leaves.append((int(m0), int(m1)))
            else:
                stack.append(int(m0))
    return leaves


def test_dense_tables_built_and_cover_source(monkeypatch):
    monkeypatch.setenv("STEELJAX_DENSE_ANYHIT", "1")
    tris = _soup(4000, 9)
    ds = np.zeros(4000, bool)
    tables, order, padded = prepare_tables(tris, ds, leaf_size=24,
                                           use_pallas=True)
    chunk = tables.chunks[0]
    assert chunk.anyhit_tris is not None and chunk.anyhit_bvh8 is not None

    # Dense leaf starts are DENSE_PER_ROW-aligned and cover every source
    # triangle exactly as often as the nearest tables do.
    leaves = _walk_leaves(chunk.anyhit_bvh8.rows, chunk.anyhit_bvh8.width)
    covered = np.zeros(len(np.asarray(chunk.anyhit_tris))
                       * ptv.DENSE_PER_ROW, bool)
    for start, cnt in leaves:
        assert start % ptv.DENSE_PER_ROW == 0
        assert 0 < cnt <= 24
        covered[start:start + cnt] = True

    dense_tris = _unpack_dense(chunk.anyhit_tris)
    real = dense_tris[:, 0, 0] < 3.0e36
    # Every covered slot is a real triangle and vice versa.
    assert (real[: len(covered)] == covered).all()

    # The covered records are exactly the source triangle multiset.
    def keyset(t):
        return sorted(map(tuple, np.round(t.reshape(-1, 9), 4).tolist()))

    assert keyset(dense_tris[real[: len(dense_tris)]]) == keyset(tris)


def test_dense_disabled_by_env(monkeypatch):
    monkeypatch.setenv("STEELJAX_DENSE_ANYHIT", "0")
    tris = _soup(500, 3)
    tables, _, _ = prepare_tables(tris, np.zeros(500, bool), leaf_size=24,
                                  use_pallas=True)
    assert tables.chunks[0].anyhit_tris is None


def test_alpha_scenes_skip_dense():
    """Alpha-masked chunks keep the aux-lane path (masks live there)."""
    tris = _soup(500, 4)
    mask = np.full(500, 5, np.uint32)
    tables, _, _ = prepare_tables(tris, np.zeros(500, bool), leaf_size=24,
                                  use_pallas=True, tri_alpha_mask=mask)
    assert tables.chunks[0].anyhit_tris is None
