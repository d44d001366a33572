"""Wide-supernode (BVH8/BVH16) encoding tests — the CPU-checkable layer
of the Pallas packet kernel (the kernel itself cannot run under interpret
mode; on-TPU parity is covered by apps/kernel_parity.py).

Covers the width-16 collapse (8-lane child stride, zero padding) added
for the round-4 shallower-tree experiment, the Batcher network the kernel
sorts children with, and the Morton-builder leaf alignment contract
(ADVICE r3: method="morton" routes through _align_leaves untested).
"""

import numpy as np
import pytest

from steeljax.accel.bvh import (TRI_PER_ROW, build_bvh, collapse_bvh8)
from steeljax.accel.pallas_traverse import batcher_network


def _soup(n, seed, spread=10.0):
    r = np.random.default_rng(seed)
    base = r.uniform(-spread, spread, (n, 1, 3)).astype(np.float32)
    return (base + r.normal(0, 0.6, (n, 3, 3))).astype(np.float32)


@pytest.mark.parametrize("n", [2, 4, 8, 16])
def test_batcher_network_sorts(n):
    """0-1 principle: a comparator network sorts every input iff it sorts
    every binary sequence.  Apply the network (ascending CEs) to all 2^n
    0/1 vectors at once."""
    net = batcher_network(n)
    seqs = ((np.arange(2 ** n)[:, None] >> np.arange(n)[None, :]) & 1)
    seqs = seqs.astype(np.int8)
    for i, j in net:
        lo = np.minimum(seqs[:, i], seqs[:, j])
        hi = np.maximum(seqs[:, i], seqs[:, j])
        seqs[:, i], seqs[:, j] = lo, hi
    assert (np.diff(seqs, axis=1) >= 0).all()


def _walk_rows(rows, width):
    """Collect (leaf_start, count) pairs and per-child AABBs from a wide
    supernode table, mirroring the kernel's decode."""
    stride = 128 // width
    leaves = []
    boxes = []
    stack = [0]
    seen = set()
    while stack:
        sid = stack.pop()
        assert sid not in seen, "supernode cycle"
        seen.add(sid)
        row = rows[sid]
        for c in range(width):
            off = stride * c
            meta0 = int(row[off + 6])
            meta1 = int(row[off + 7])
            if meta0 < 0:
                continue  # empty slot
            boxes.append((row[off:off + 3].copy(), row[off + 3:off + 6].copy()))
            if meta1 > 0:
                assert meta0 % TRI_PER_ROW == 0  # row-aligned leaf start
                leaves.append((meta0, meta1))
            else:
                stack.append(meta0)
    return leaves, boxes


@pytest.mark.parametrize("width", [8, 16])
def test_wide_collapse_matches_binary_leaves(width):
    """The wide rows must encode exactly the binary tree's leaf set, with
    every child box a real binary-node box."""
    tris = _soup(3000, 5)
    bvh, order, padded = build_bvh(tris, leaf_size=24)
    nodes = np.asarray(bvh.nodes)
    rows, depth = collapse_bvh8(nodes, 24, width=width)
    assert rows.shape[1] == 128

    leaf_mask = nodes[:, 7] > 0
    want = {(int(s), int(c)) for s, c in
            zip(nodes[leaf_mask, 6], nodes[leaf_mask, 7])}
    got_leaves, got_boxes = _walk_rows(rows, width)
    assert set(got_leaves) == want
    assert len(got_leaves) == len(want)

    # Every emitted child AABB equals some binary node's AABB exactly.
    node_boxes = {tuple(np.concatenate([n[0:3], n[3:6]]).tolist())
                  for n in nodes}
    for lo, hi in got_boxes:
        assert tuple(np.concatenate([lo, hi]).tolist()) in node_boxes

    # Wider fanout must not deepen the tree, and 16-wide should shrink
    # the row count (8-wide pads half of every row).
    rows8, depth8 = collapse_bvh8(nodes, 24, width=8)
    if width == 16:
        assert depth <= depth8
        assert len(rows) < len(rows8)


def test_wide_collapse_counts_fit_encoding():
    """Leaf counts must stay within the kernel's _LEAF_BITS encoding and
    starts within TRI_PER_ROW alignment for both widths."""
    tris = _soup(500, 11)
    bvh, order, padded = build_bvh(tris, leaf_size=24)
    for width in (8, 16):
        rows, _ = collapse_bvh8(np.asarray(bvh.nodes), 24, width=width)
        leaves, _ = _walk_rows(rows, width)
        for start, cnt in leaves:
            assert 0 < cnt <= 24
            assert start % TRI_PER_ROW == 0


def test_morton_builder_alignment():
    """ADVICE r3: method="morton" routes through _align_leaves — assert
    row alignment, permutation completeness, and that the binary walk
    still sees every triangle."""
    tris = _soup(700, 3)
    bvh, order, padded = build_bvh(tris, leaf_size=24, method="morton")
    nodes = np.asarray(bvh.nodes)
    leaf_mask = nodes[:, 7] > 0
    starts = nodes[leaf_mask, 6].astype(np.int64)
    assert (starts % TRI_PER_ROW == 0).all()
    # Permutation completeness: every source triangle appears exactly once.
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(len(tris)))
    assert len(order) == padded
    # Leaf ranges cover every permuted slot that holds a real triangle.
    covered = np.zeros(padded, bool)
    counts = nodes[leaf_mask, 7].astype(np.int64)
    for s, c in zip(starts, counts):
        covered[s:s + c] = True
    assert covered[np.nonzero(order >= 0)[0]].all()
