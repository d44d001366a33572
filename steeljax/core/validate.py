"""Invariant validation layer (the Vulkan-validation-layers analog).

The reference leans on two oracles for structural correctness: the
`Assert` macro (Source/Utils/Assert.hpp:1-9 — hard assert in debug,
logged-and-continue in release) and the Vulkan validation layers enabled
in debug builds (Source/Engine/Render/Vulkan/VulkanContext).  steeljax has
no driver to validate API usage, but its hand-built device structures
(flattened scene tables, explicit BVH nodes) carry exactly the kind of
cross-array index invariants the validation layers would have caught —
this module checks them.

Usage: `steel_assert` anywhere (same debug/release semantics as the
reference's macro — STEELJAX_DEBUG=0 demotes failures to logged errors);
`validate_flat_scene` / `validate_bvh` run automatically inside
`prepare_scene` when STEELJAX_VALIDATE=1 (the "enable validation layers"
switch) and always in the test suite.
"""

from __future__ import annotations

import os

import numpy as np

from steeljax.core.logger import log_e


def _debug_enabled() -> bool:
    return os.environ.get("STEELJAX_DEBUG", "1") != "0"


def validation_enabled() -> bool:
    """The kValidationEnabled switch (Config.hpp): opt-in per run."""
    return os.environ.get("STEELJAX_VALIDATE", "0") == "1"


def steel_assert(condition: bool, message: str = "") -> None:
    """Assert.hpp semantics: raise in debug, log-and-continue in release
    (`STEELJAX_DEBUG=0`)."""
    if condition:
        return
    if _debug_enabled():
        raise AssertionError(f"steel_assert failed: {message}")
    log_e("Assertion failed:", message)


def validate_flat_scene(flat) -> None:
    """Cross-array invariants of the flattened scene (scene.flatten):
    per-triangle tables row-aligned, material/texture indices in range,
    geometry finite, light count within the gpu::Light capacity."""
    t = int(flat.tri_pos.shape[0])
    for name in ("tri_nrm", "tri_tan", "tri_uv", "tri_mat",
                 "tri_double_sided", "tri_shade"):
        steel_assert(int(getattr(flat, name).shape[0]) == t,
                     f"{name} rows != tri_pos rows")
    m = int(flat.mat_packed.shape[0])
    tri_mat = np.asarray(flat.tri_mat)
    if t:
        steel_assert(int(tri_mat.min(initial=0)) >= 0
                     and int(tri_mat.max(initial=0)) < m,
                     "tri_mat index out of material-table range")
        steel_assert(bool(np.isfinite(np.asarray(flat.tri_pos)).all()),
                     "non-finite triangle positions")
    k = int(flat.tex_size.shape[0])
    mat_tex = np.asarray(flat.mat_tex)
    steel_assert(int(mat_tex.min(initial=-1)) >= -1
                 and int(mat_tex.max(initial=-1)) < k,
                 "mat_tex texture index out of atlas range")
    steel_assert(0 <= int(flat.light_count) <= flat.light_location.shape[0],
                 "light_count exceeds MAX_LIGHT_COUNT padding")
    steel_assert(flat.tri_shade.shape[1] == 56, "tri_shade layout changed")


def validate_bvh(bvh, tri_count: int) -> None:
    """Explicit-node BVH invariants (accel.bvh format): child/leaf ranges
    in bounds, leaf starts row-aligned (the kernel's row-read contract,
    bvh.TRI_PER_ROW), child boxes contained in parents (within epsilon),
    every padded triangle slot reachable from exactly one leaf."""
    nodes = np.asarray(bvh.nodes)
    n = nodes.shape[0]
    meta0 = nodes[:, 6].astype(np.int64)
    meta1 = nodes[:, 7].astype(np.int64)
    leaf = meta1 > 0
    internal = ~leaf

    steel_assert(bool((meta0[internal] >= 0).all())
                 and bool((meta0[internal] + 1 < n).all()),
                 "internal child index out of node range")
    steel_assert(bool((meta0[leaf] >= 0).all())
                 and bool(((meta0[leaf] + meta1[leaf]) <= tri_count).all()),
                 "leaf triangle range exceeds triangle table")
    from steeljax.accel.bvh import TRI_PER_ROW
    steel_assert(bool((meta0[leaf] % TRI_PER_ROW == 0).all()),
                 "leaf start not row-aligned (kernel row-read contract)")
    steel_assert(bool((meta1[leaf] <= bvh.max_leaf).all()),
                 "leaf count exceeds max_leaf")
    # Triangle coverage: leaves must tile [0, tri_count) without overlap.
    if leaf.any():
        starts = meta0[leaf]
        counts = meta1[leaf]
        order = np.argsort(starts)
        s, c = starts[order], counts[order]
        steel_assert(bool((s[1:] >= (s[:-1] + c[:-1])).all()),
                     "overlapping leaf triangle ranges")
    # Containment: child boxes inside parent boxes (within epsilon).
    if internal.any():
        li = meta0[internal]
        eps = 1e-3 * max(1.0, float(np.abs(nodes[0, :6]).max()))
        for child in (li, li + 1):
            ok = ((nodes[child, 0:3] >= nodes[internal, 0:3] - eps).all()
                  and (nodes[child, 3:6] <= nodes[internal, 3:6] + eps)
                  .all())
            steel_assert(bool(ok), "child AABB escapes parent AABB")


def validate_tables(tables, tri_count: int) -> None:
    """Validate every chunk BVH of a TraceTables (dispatch.prepare_tables
    output); chunk row ranges must tile the padded triangle table."""
    offset = 0
    for chunk in tables.chunks:
        steel_assert(chunk.row_offset == offset,
                     "chunk row_offset not contiguous")
        validate_bvh(chunk.bvh, chunk.rows)
        offset += chunk.rows
    steel_assert(offset == tri_count or tri_count == 0,
                 "chunk rows do not tile the padded triangle table")
