"""Morton-ordered implicit-heap BVH ("LBVH") built host-side in numpy.

The reference gets BLAS/TLAS builds for free from the Vulkan driver
(AccelerationStructureManager.cpp:62-220).  On TPU we build our own: sort
triangles by 30-bit Morton code of their centroid, group consecutive
triangles into fixed-size leaves, and form a complete binary tree over the
leaf array in implicit heap order (children of node i are 2i+1 / 2i+2).
AABBs are computed bottom-up with log2(N) vectorized passes.

The implicit layout means the device only needs two (num_nodes, 3) float32
arrays — no child pointers, no leaf index indirection: leaf l covers
triangles [l*leaf_size, (l+1)*leaf_size) of the *permuted* triangle arrays,
which keeps leaf reads contiguous (dynamic-slice, not gather) on TPU.

Build is O(N log N) numpy; for multi-million-triangle scenes the optional
C++ builder (steeljax/native) provides the same outputs faster.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

_PAD_VALUE = 3.0e37  # padded triangles live here -> never hit


@struct.dataclass
class BVH:
    node_min: jnp.ndarray  # (2*L-1, 3) float32, heap order, root at 0
    node_max: jnp.ndarray  # (2*L-1, 3) float32
    num_leaves: int = struct.field(pytree_node=False)
    leaf_size: int = struct.field(pytree_node=False)
    depth: int = struct.field(pytree_node=False)  # levels below the root

    @property
    def first_leaf(self) -> int:
        return self.num_leaves - 1


def _morton3(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit coords into 30-bit Morton codes."""
    def expand(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint32)
        v = (v | (v << 16)) & np.uint32(0x030000FF)
        v = (v | (v << 8)) & np.uint32(0x0300F00F)
        v = (v | (v << 4)) & np.uint32(0x030C30C3)
        v = (v | (v << 2)) & np.uint32(0x09249249)
        return v
    return (expand(x[:, 0]) << 2) | (expand(x[:, 1]) << 1) | expand(x[:, 2])


def build_bvh(tri_pos: np.ndarray, leaf_size: int = 4
              ) -> tuple[BVH, np.ndarray, int]:
    """Build a BVH over (T, 3, 3) world-space triangles.

    Returns (bvh, permutation, padded_count): the caller must reorder all
    per-triangle arrays by `permutation` and pad them to `padded_count`
    (apply_permutation does both).
    """
    tri_pos = np.asarray(tri_pos, np.float32)
    count = len(tri_pos)
    if count == 0:
        node = np.full((1, 3), _PAD_VALUE, np.float32)
        return (BVH(node_min=jnp.asarray(node), node_max=jnp.asarray(node),
                    num_leaves=1, leaf_size=leaf_size, depth=0),
                np.zeros(0, np.int64), leaf_size)

    centroids = tri_pos.mean(axis=1)
    lo = centroids.min(axis=0)
    hi = centroids.max(axis=0)
    extent = np.maximum(hi - lo, 1e-9)
    quantized = np.clip(
        ((centroids - lo) / extent * 1023.0), 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(quantized), kind="stable")

    num_leaves_raw = -(-count // leaf_size)
    num_leaves = 1 << max(0, (num_leaves_raw - 1).bit_length())
    padded = num_leaves * leaf_size

    sorted_pos = np.full((padded, 3, 3), _PAD_VALUE, np.float32)
    sorted_pos[:count] = tri_pos[order]

    # Leaf AABBs over contiguous chunks.
    chunk = sorted_pos.reshape(num_leaves, leaf_size, 3, 3)
    leaf_min = chunk.min(axis=(1, 2))
    leaf_max = chunk.max(axis=(1, 2))
    # Empty/pad-only leaves become inverted boxes that never intersect.
    pad_leaf = leaf_min[:, 0] >= _PAD_VALUE
    leaf_min[pad_leaf] = _PAD_VALUE
    leaf_max[pad_leaf] = -_PAD_VALUE
    # Mixed leaves: drop pad vertices from bounds.
    mixed = (leaf_max[:, 0] >= _PAD_VALUE) & ~pad_leaf
    if mixed.any():
        for li in np.nonzero(mixed)[0]:
            tris = chunk[li].reshape(-1, 3)
            real = tris[:, 0] < _PAD_VALUE
            leaf_min[li] = tris[real].min(axis=0)
            leaf_max[li] = tris[real].max(axis=0)

    depth = int(np.log2(num_leaves))
    node_min = np.empty((2 * num_leaves - 1, 3), np.float32)
    node_max = np.empty((2 * num_leaves - 1, 3), np.float32)
    node_min[num_leaves - 1:] = leaf_min
    node_max[num_leaves - 1:] = leaf_max
    for level in range(depth - 1, -1, -1):
        first = (1 << level) - 1
        size = 1 << level
        child_first = 2 * first + 1
        cmin = node_min[child_first:child_first + 2 * size].reshape(size, 2, 3)
        cmax = node_max[child_first:child_first + 2 * size].reshape(size, 2, 3)
        node_min[first:first + size] = cmin.min(axis=1)
        node_max[first:first + size] = cmax.max(axis=1)

    bvh = BVH(node_min=jnp.asarray(node_min), node_max=jnp.asarray(node_max),
              num_leaves=num_leaves, leaf_size=leaf_size, depth=depth)
    return bvh, order, padded


def apply_permutation(bvh_result, arrays: dict[str, np.ndarray]
                      ) -> dict[str, np.ndarray]:
    """Reorder + pad per-triangle arrays to match the BVH leaf layout.

    Pad triangles get _PAD_VALUE positions (never hit) and zeros elsewhere.
    """
    bvh, order, padded = bvh_result
    out = {}
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        shape = (padded,) + arr.shape[1:]
        if name == "tri_pos":
            dst = np.full(shape, _PAD_VALUE, arr.dtype)
        else:
            dst = np.zeros(shape, arr.dtype)
        dst[:len(order)] = arr[order]
        out[name] = dst
    return out
