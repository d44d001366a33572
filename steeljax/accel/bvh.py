"""BVH construction: binned-SAH (native C++) with a Morton fallback.

The reference gets BLAS/TLAS builds from the Vulkan driver
(AccelerationStructureManager.cpp:62-220).  steeljax builds its own, in an
explicit-node format shared by both builders:

  nodes[i] = [min.xyz, max.xyz, meta0, meta1]   (8 f32)
    internal: meta0 = left child index (right child = left + 1), meta1 = 0
    leaf:     meta0 = first triangle, meta1 = triangle count (> 0)

Indices are exact float values (< 2^24).  Leaf triangle ranges are
contiguous in the permuted triangle arrays, so device leaf reads are
dynamic slices, not gathers.

Builders:
* `steeljax.native.build_bvh_sah` — 16-bin SAH in C++ (preferred; better
  trees mean fewer packet node visits on TPU).
* `_build_morton` — numpy fallback: Morton-sort + complete binary tree
  over fixed-size leaves (the original LBVH-style build).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

_PAD_VALUE = 3.0e37  # padded triangles live here -> never hit

# Packed-triangle row layout shared by the builders and the Pallas
# kernels: a 128-lane VMEM row holds TRI_PER_ROW records of TRI_STRIDE
# f32 each ([v0.xyz, e1.xyz, e2.xyz, double_sided]).  12 x 10 = 120 lanes
# (8 pad) stores 1.6x the triangles per byte of the previous 8 x 16
# layout — the chunk VMEM ceiling (dispatch.MAX_CHUNK_TRIS) scales with
# it.  Leaf starts are TRI_PER_ROW-aligned so record fields sit at
# static lane offsets (Mosaic cannot index lanes dynamically).
TRI_PER_ROW = 12
TRI_STRIDE = 10


@struct.dataclass
class BVH:
    nodes: jnp.ndarray  # (N, 8) float32 explicit nodes (see module doc)
    depth: int = struct.field(pytree_node=False)      # max tree depth
    max_leaf: int = struct.field(pytree_node=False)   # max tris per leaf

    @property
    def node_count(self) -> int:
        return self.nodes.shape[0]


def _morton3(x: np.ndarray) -> np.ndarray:
    def expand(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint32)
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v
    return (expand(x[:, 0]) << 2) | (expand(x[:, 1]) << 1) | expand(x[:, 2])


def _build_morton(tri_pos: np.ndarray, leaf_size: int
                  ) -> tuple[np.ndarray, np.ndarray, int]:
    """Morton-ordered complete-tree build -> (nodes, permutation, depth)."""
    count = len(tri_pos)
    centroids = tri_pos.mean(axis=1)
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    extent = np.maximum(hi - lo, 1e-9)
    quantized = np.clip(
        ((centroids - lo) / extent * 1023.0), 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(quantized), kind="stable").astype(np.int64)

    num_leaves_raw = -(-count // leaf_size)
    num_leaves = 1 << max(0, (num_leaves_raw - 1).bit_length())
    padded = num_leaves * leaf_size

    sorted_pos = np.full((padded, 3, 3), _PAD_VALUE, np.float32)
    sorted_pos[:count] = tri_pos[order]

    chunk = sorted_pos.reshape(num_leaves, leaf_size, 3, 3)
    leaf_min = chunk.min(axis=(1, 2))
    leaf_max = chunk.max(axis=(1, 2))
    pad_leaf = leaf_min[:, 0] >= _PAD_VALUE
    leaf_min[pad_leaf] = _PAD_VALUE
    leaf_max[pad_leaf] = -_PAD_VALUE
    mixed = (leaf_max[:, 0] >= _PAD_VALUE) & ~pad_leaf
    for li in np.nonzero(mixed)[0]:
        tris = chunk[li].reshape(-1, 3)
        real = tris[:, 0] < _PAD_VALUE
        leaf_min[li] = tris[real].min(axis=0)
        leaf_max[li] = tris[real].max(axis=0)

    depth = int(np.log2(num_leaves)) + 1
    first_leaf = num_leaves - 1
    n_nodes = 2 * num_leaves - 1
    nodes = np.zeros((n_nodes, 8), np.float32)
    nodes[first_leaf:, 0:3] = leaf_min
    nodes[first_leaf:, 3:6] = leaf_max
    nodes[first_leaf:, 6] = (np.arange(num_leaves) * leaf_size).astype(
        np.float32)
    nodes[first_leaf:, 7] = float(leaf_size)
    for level in range(depth - 2, -1, -1):
        first = (1 << level) - 1
        size = 1 << level
        child_first = 2 * first + 1
        cmin = nodes[child_first:child_first + 2 * size, 0:3].reshape(
            size, 2, 3)
        cmax = nodes[child_first:child_first + 2 * size, 3:6].reshape(
            size, 2, 3)
        nodes[first:first + size, 0:3] = cmin.min(axis=1)
        nodes[first:first + size, 3:6] = cmax.max(axis=1)
        nodes[first:first + size, 6] = (
            2 * np.arange(first, first + size) + 1).astype(np.float32)
        nodes[first:first + size, 7] = 0.0
    return nodes, order, depth


def _spatial_alpha(method: str) -> float:
    """Spatial-split overlap threshold for a build method.

    "sbvh" forces spatial splits on, "sah" forces pure object SAH;
    "auto" follows STEELJAX_SBVH ("1" enables at alpha 1e-5, any float
    overrides the alpha; default OFF — host-proxy row costs say the
    all-axis object SAH captures nearly all of the tree-quality win on
    the bench scenes, with spatial splits WORSE on stress-class
    geometry (+14% area-weighted rows from duplication) and only -6%
    on foliage; kept opt-in for San Miguel-class mixed geometry)."""
    if method == "sah":
        return 0.0
    if method == "sbvh":
        return 1e-5
    import os
    env = os.environ.get("STEELJAX_SBVH", "0")
    if env == "0":
        return 0.0
    if env == "1":
        return 1e-5
    try:
        return float(env)
    except ValueError:
        return 1e-5


def build_bvh(tri_pos: np.ndarray, leaf_size: int = 64,
              method: str = "auto") -> tuple[BVH, np.ndarray, int]:
    """Build a BVH over (T, 3, 3) world-space triangles.

    Returns (bvh, order, padded_count): reorder all per-triangle arrays
    by `order` and pad to `padded_count` (apply_permutation).  With
    spatial splits (default) `order` is a REFERENCE list — a triangle id
    may appear under several leaves (clipped-box duplicates, bounded at
    1.5x) — which gather-based consumers handle identically to a
    permutation.
    method: "auto" (native SBVH, Morton fallback) | "sbvh" | "sah"
    (object-only) | "morton".
    """
    tri_pos = np.asarray(tri_pos, np.float32)
    count = len(tri_pos)
    if count == 0:
        nodes = np.zeros((1, 8), np.float32)
        nodes[0] = [_PAD_VALUE, _PAD_VALUE, _PAD_VALUE,
                    -_PAD_VALUE, -_PAD_VALUE, -_PAD_VALUE, 0.0, 1.0]
        return (BVH(nodes=jnp.asarray(nodes), depth=1, max_leaf=leaf_size),
                np.zeros(0, np.int64),
                -(-leaf_size // TRI_PER_ROW) * TRI_PER_ROW)

    if method in ("auto", "sah", "sbvh"):
        from steeljax.native import build_bvh_sah
        result = build_bvh_sah(tri_pos, leaf_size,
                               spatial_alpha=_spatial_alpha(method))
        if result is not None:
            nodes, perm, depth = result
            nodes, perm, padded = _align_leaves(nodes, perm, leaf_size)
            return (BVH(nodes=jnp.asarray(nodes), depth=depth,
                        max_leaf=leaf_size), perm, padded)
        if method in ("sah", "sbvh"):
            raise RuntimeError("native SAH builder unavailable")

    nodes, perm, depth = _build_morton(tri_pos, leaf_size)
    # Unify on the aligned layout: Morton leaves start at multiples of
    # leaf_size, which need not be TRI_PER_ROW-aligned.
    num_leaves = (len(nodes) + 1) // 2
    perm_full = np.full(num_leaves * leaf_size, -1, np.int64)
    perm_full[:len(perm)] = perm
    nodes, perm, padded = _align_leaves(nodes, perm_full, leaf_size)
    return (BVH(nodes=jnp.asarray(nodes), depth=depth, max_leaf=leaf_size),
            perm, padded)


def _align_leaves(nodes: np.ndarray, perm: np.ndarray, leaf_size: int,
                  align: int = TRI_PER_ROW
                  ) -> tuple[np.ndarray, np.ndarray, int]:
    """Re-layout leaf triangle ranges so every leaf starts at a multiple of
    `align` (the TPU kernel reads leaves as whole 128-float rows of
    TRI_PER_ROW triangle records).  Returns (nodes, order-with-pads,
    padded_count) where order entries of -1 denote pad slots."""
    nodes = np.asarray(nodes)
    leaf_mask = nodes[:, 7] > 0
    leaf_idx = np.nonzero(leaf_mask)[0]
    starts = nodes[leaf_idx, 6].astype(np.int64)
    counts = nodes[leaf_idx, 7].astype(np.int64)
    # Process leaves in storage order so output stays partition-contiguous.
    order_of_leaves = np.argsort(starts, kind="stable")
    aligned_counts = -(-counts[order_of_leaves] // align) * align
    new_starts_sorted = np.concatenate(
        [[0], np.cumsum(aligned_counts)[:-1]])
    # One extra max-size leaf of pad slack so fixed-size leaf reads
    # (max_leaf rows) from the last leaf never run past the arrays;
    # round to whole rows so packed tables concatenate row-exactly.
    slack = -(-leaf_size // align) * align
    total = int(aligned_counts.sum()) + slack

    new_order = np.full(total, -1, np.int64)
    new_starts = np.empty(len(leaf_idx), np.int64)
    new_starts[order_of_leaves] = new_starts_sorted
    for li, ns in zip(range(len(leaf_idx)), new_starts):
        s, c = starts[li], counts[li]
        new_order[ns:ns + c] = perm[s:s + c]
    nodes = nodes.copy()
    nodes[leaf_idx, 6] = new_starts.astype(np.float32)
    return nodes, new_order, total


def apply_permutation(bvh_result, arrays: dict[str, np.ndarray]
                      ) -> dict[str, np.ndarray]:
    """Reorder + pad per-triangle arrays to match the BVH leaf layout.

    `order` entries of -1 are pad slots: pad triangles get _PAD_VALUE
    positions (never hit) and zeros elsewhere.
    """
    _, order, padded = bvh_result
    out = {}
    real = order >= 0
    src_idx = order[real]
    dst_idx = np.nonzero(real)[0] if len(order) else order
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        shape = (padded,) + arr.shape[1:]
        if name == "tri_pos":
            dst = np.full(shape, _PAD_VALUE, arr.dtype)
        else:
            dst = np.zeros(shape, arr.dtype)
        if len(order):
            if len(order) <= padded and real.all():
                dst[:len(order)] = arr[order]
            else:
                dst[dst_idx] = arr[src_idx]
        out[name] = dst
    return out


# ---------------------------------------------------------------------------
# 8-wide collapse (BVH8) for the TPU packet kernel
# ---------------------------------------------------------------------------

@struct.dataclass
class BVH8:
    """Wide (multi-branch) BVH: one (128,) f32 row per supernode — child c
    occupies lanes [stride*c, stride*c + 8) with stride = 128 // width:
    [min.xyz, max.xyz, meta0, meta1] (+ pad lanes when stride > 8).

    width 8 (default): 16-lane child stride, 8 pad lanes per child.
    width 16: 8-lane stride, zero padding — half the node VMEM and half
    the scalar pops of the 8-wide tree for the same leaves (one pop
    slab-tests 16 children).

    meta1 > 0: leaf child (meta0 = TRI_PER_ROW-aligned first triangle,
               meta1 = count)
    meta1 == 0 and meta0 >= 0: internal child (meta0 = supernode index)
    empty slots have inverted AABBs and meta0 = -1.

    One scalar pop tests `width` children, cutting the packet kernel's
    scalar sync overhead ~3x (8-wide) vs the binary tree, and the row
    layout stores supernodes densely in VMEM.
    """
    rows: jnp.ndarray  # (S, 128) float32
    depth: int = struct.field(pytree_node=False)
    max_leaf: int = struct.field(pytree_node=False)
    width: int = struct.field(pytree_node=False, default=8)


def collapse_bvh8(nodes: np.ndarray, max_leaf: int,
                  root: int = 0, width: int = 8) -> tuple[np.ndarray, int]:
    """Collapse a binary explicit-node (sub)tree into width-wide rows.

    Strategy: starting from a binary node, repeatedly expand the internal
    slot with the largest surface area until there are `width` slots or
    only leaves remain.  `root` selects a subtree (treelet builds collapse
    each cut node separately).  Returns (rows (S, 128) f32, depth)."""
    nodes = np.asarray(nodes)
    stride = 128 // width
    assert stride * width == 128 and stride >= 8, width

    def area(i):
        d = np.maximum(nodes[i, 3:6] - nodes[i, 0:3], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    rows: list[np.ndarray] = []

    def is_leaf(i):
        return nodes[i, 7] > 0

    def build(binary_root: int) -> tuple[int, int]:
        """Returns (supernode index, subtree depth)."""
        slots = [binary_root]
        while len(slots) < width:
            internal = [s for s in slots if not is_leaf(s)]
            if not internal:
                break
            expand = max(internal, key=area)
            slots.remove(expand)
            left = int(nodes[expand, 6])
            slots.extend([left, left + 1])

        sid = len(rows)
        rows.append(np.zeros(128, np.float32))
        depth = 1
        row = rows[sid]
        for c in range(width):
            off = stride * c
            if c < len(slots):
                s = slots[c]
                row[off:off + 6] = nodes[s, 0:6]
                if is_leaf(s):
                    row[off + 6] = nodes[s, 6]
                    row[off + 7] = nodes[s, 7]
                else:
                    child_sid, child_depth = build(s)
                    row = rows[sid]  # list may have grown; rebind
                    row[off:off + 6] = nodes[s, 0:6]
                    row[off + 6] = float(child_sid)
                    row[off + 7] = 0.0
                    depth = max(depth, 1 + child_depth)
            else:
                row[off:off + 3] = 3.0e37
                row[off + 3:off + 6] = -3.0e37
                row[off + 6] = -1.0
                row[off + 7] = 0.0
        return sid, depth

    import sys
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        _, depth = build(int(root))
    finally:
        sys.setrecursionlimit(old_limit)
    return np.stack(rows), depth


def subtree_tri_ranges(nodes: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                                   np.ndarray]:
    """Per-node (count, lo, hi) over the aligned triangle layout.

    The SAH builder partitions triangles in place, so every subtree owns
    a CONTIGUOUS range of the permuted arrays (bvh_builder.cpp:14-15);
    after _align_leaves each leaf range is TRI_PER_ROW-aligned.  `hi` is
    the exclusive row-aligned end of the last leaf.  Iterative post-order
    (trees reach ~10^5 nodes)."""
    nodes = np.asarray(nodes)
    n = len(nodes)
    count = np.zeros(n, np.int64)
    lo = np.full(n, np.iinfo(np.int64).max)
    hi = np.zeros(n, np.int64)
    is_leaf = nodes[:, 7] > 0
    stack = [(0, False)]
    while stack:
        i, expanded = stack.pop()
        if is_leaf[i]:
            start = int(nodes[i, 6])
            cnt = int(nodes[i, 7])
            count[i] = cnt
            lo[i] = start
            hi[i] = start + -(-cnt // TRI_PER_ROW) * TRI_PER_ROW
        elif not expanded:
            left = int(nodes[i, 6])
            stack.append((i, True))
            stack.append((left, False))
            stack.append((left + 1, False))
        else:
            left = int(nodes[i, 6])
            count[i] = count[left] + count[left + 1]
            lo[i] = min(lo[left], lo[left + 1])
            hi[i] = max(hi[left], hi[left + 1])
    return count, lo, hi
