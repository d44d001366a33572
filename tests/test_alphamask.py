"""Conservative in-traversal alpha-coverage masks (accel.alphamask).

The masks let traversal reject provably-transparent alpha-test hits
without sampling the texture (the reference's any-hit shader,
AnyHit.rahit:25-52); the contract under test is CONSERVATIVENESS — a
zero bit must imply the integrator's exact test (_alpha_rejected) would
reject every hit in that cell, so masking can remove work but never
change the image."""

import numpy as np
import jax.numpy as jnp

from steeljax.accel.alphamask import (CELLS, GRID, MASK_FULL, cell_index,
                                      compute_alpha_masks, mask_test)
from steeljax.scene.builtin import _leaf_texture, make_foliage_scene
from steeljax.scene.material import MaterialFlags


def _bilinear_alpha(tex, u, v):
    """Repeat-wrap bilinear alpha with render.texture's convention
    (texel centers at (i + 0.5) / w)."""
    h, w = tex.shape[:2]
    a = tex[..., 3].astype(np.float32) / 255.0
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = x - x0
    fy = y - y0
    x0 %= w
    y0 %= h
    x1 = (x0 + 1) % w
    y1 = (y0 + 1) % h
    return (a[y0, x0] * (1 - fx) * (1 - fy) + a[y0, x1] * fx * (1 - fy)
            + a[y1, x0] * (1 - fx) * fy + a[y1, x1] * fx * fy)


def test_cell_index_is_triangular_bijection():
    seen = set()
    for j in range(GRID):
        for i in range(GRID - j):
            idx = int(cell_index(np.int32(i), np.int32(j)))
            assert 0 <= idx < CELLS
            seen.add(idx)
    assert len(seen) == CELLS


def test_masks_are_conservative_on_leaf_texture():
    """bit == 0 must imply every bilinear sample in the cell is below the
    cutoff (dense stratified probe of each zero cell)."""
    rng = np.random.default_rng(5)
    tex = _leaf_texture()
    n = 64
    uv = rng.uniform(-0.2, 1.2, (n, 3, 2)).astype(np.float32)
    tri_mat = np.zeros(n, np.int32)
    masks = compute_alpha_masks(
        uv, tri_mat,
        mat_base_color=np.array([[1, 1, 1, 1.0]], np.float32),
        mat_params=np.array([[0.8, 0, 1, 1, 0.5]], np.float32),
        mat_tex=np.array([[0, -1, -1, -1, -1]], np.int32),
        mat_flags=np.array([int(MaterialFlags.ALPHA_TEST)], np.int32),
        textures=[tex])
    assert masks.shape == (n,)
    # The leaf texture is ~45% covered: some cells must actually be zero
    # across the batch or the mask does nothing.
    zero_bits = sum(CELLS - bin(int(m)).count("1") for m in masks)
    assert zero_bits > n  # > 1 zero cell per triangle on average

    # Stratified barycentric probes per triangle.
    g = 24
    us, vs = np.meshgrid((np.arange(g) + 0.5) / g, (np.arange(g) + 0.5) / g)
    keep = (us + vs) < 1.0
    us, vs = us[keep], vs[keep]
    for k in range(0, n, 7):
        pu = uv[k, 0, 0] + us * (uv[k, 1, 0] - uv[k, 0, 0]) \
            + vs * (uv[k, 2, 0] - uv[k, 0, 0])
        pv = uv[k, 0, 1] + us * (uv[k, 1, 1] - uv[k, 0, 1]) \
            + vs * (uv[k, 2, 1] - uv[k, 0, 1])
        alpha = _bilinear_alpha(tex, pu, pv)
        ci = np.clip((us * GRID).astype(np.int64), 0, GRID - 1)
        cj = np.clip((vs * GRID).astype(np.int64), 0, GRID - 1)
        bit = (int(masks[k]) >> np.asarray(cell_index(ci, cj))) & 1
        rejected_cell = (bit == 0) & ((ci + cj) <= GRID - 1)
        assert (alpha[rejected_cell] < 0.5).all(), \
            f"non-conservative mask for triangle {k}"


def test_masks_opaque_and_degenerate_materials():
    uv = np.random.default_rng(0).uniform(0, 1, (6, 3, 2)).astype(np.float32)
    tex = np.full((4, 4, 4), 255, np.uint8)
    flags = np.array([0,                                   # not alpha-test
                      int(MaterialFlags.ALPHA_TEST),       # no texture
                      int(MaterialFlags.ALPHA_TEST)], np.int32)
    tex_ids = np.array([[0] * 5, [-1] * 5, [0, -1, -1, -1, -1]], np.int32)
    base = np.array([[1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 0.0]],
                    np.float32)
    params = np.tile(np.array([1, 0, 1, 1, 0.5], np.float32), (3, 1))
    masks = compute_alpha_masks(
        uv, np.array([0, 1, 2, 0, 1, 2], np.int32), base, params, tex_ids,
        flags, [tex])
    assert int(masks[0]) == MASK_FULL          # opaque material
    assert int(masks[1]) == MASK_FULL          # alpha-test without texture
    assert int(masks[2]) == 0                  # alpha factor 0: all clear


def test_mask_test_matches_numpy_reference():
    rng = np.random.default_rng(3)
    m = rng.integers(0, MASK_FULL + 1, 512).astype(np.int32)
    u = rng.uniform(0, 1, 512).astype(np.float32)
    v = rng.uniform(0, 1, 512).astype(np.float32) * (1.0 - u)
    got = np.asarray(mask_test(jnp.asarray(m), jnp.asarray(u),
                               jnp.asarray(v)))
    ci = np.clip((u * GRID).astype(np.int64), 0, GRID - 1)
    cj = np.clip((v * GRID).astype(np.int64), 0, GRID - 1)
    want = (((m >> np.asarray(cell_index(ci, cj))) & 1) == 1) \
        | ((ci + cj) > GRID - 1)
    assert (got == want).all()


def test_masked_oracle_matches_unmasked_integrator_image():
    """End-to-end: a sparse foliage scene rendered with in-traversal masks
    (default prepare_scene) must EQUAL the unmasked build (masks only
    remove hits the exact re-trace loop rejects anyway)."""
    from steeljax.core import camera as camera_lib
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.integrator import render_pixels
    from steeljax.render.pt.renderer import prepare_scene

    scene = make_foliage_scene(cards=40, region=3.0)
    flat, tables = prepare_scene(scene, env_resolution=8)
    assert tables.alpha_masked, "foliage build should carry alpha masks"
    assert tables.chunks[0].tri_mask is not None

    # Unmasked twin: same build with the mask bits stripped from the
    # tables (the CPU oracle reads chunk.tri_mask, so dropping it reverts
    # to pure re-trace semantics; the BVH/permutation are identical).
    flat2, tables2 = prepare_scene(scene, env_resolution=8)
    tables2 = tables2.replace(
        alpha_masked=False,
        chunks=tuple(c.replace(tri_mask=None) for c in tables2.chunks))

    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    config = RenderConfig(width=64, height=64, max_bounce_count=2)
    px, py = jnp.meshgrid(jnp.arange(64), jnp.arange(64))
    px = px.reshape(-1).astype(jnp.int32)
    py = py.reshape(-1).astype(jnp.int32)

    def render(f, t):
        return np.asarray(render_pixels(
            f, t, jnp.asarray(frame.inverse_view),
            jnp.asarray(frame.inverse_proj), frame.camera_near,
            frame.camera_far, 64, 64, px, py, 0, 0, config))

    a = render(flat, tables)
    b = render(flat2, tables2)
    assert np.allclose(a, b, atol=1e-5), float(np.abs(a - b).max())


# --- two-plane fine masks (multi-hit kernel; accel.alphamask FINE_*) -----

from steeljax.accel.alphamask import (FINE_CELLS, FINE_GRID, FINE_STRIDE,
                                      FINE_WORDS, compute_fine_masks,
                                      fine_cell, fine_mask_test)


def _fine_args(uv, tri_mat, tex):
    return dict(
        tri_uv=uv, tri_mat=tri_mat,
        mat_base_color=np.array([[1, 1, 1, 1.0]], np.float32),
        mat_params=np.array([[0.8, 0, 1, 1, 0.5]], np.float32),
        mat_tex=np.array([[0, -1, -1, -1, -1]], np.int32),
        mat_flags=np.array([int(MaterialFlags.ALPHA_TEST)], np.int32),
        textures=[tex])


def test_fine_masks_conservative_both_planes():
    """PASS bit 0 => every bilinear sample in the cell is < cutoff;
    OPAQUE bit 1 => every bilinear sample is >= cutoff (the exact test
    provably keeps the hit)."""
    rng = np.random.default_rng(7)
    tex = _leaf_texture()
    n = 48
    uv = rng.uniform(-0.2, 1.2, (n, 3, 2)).astype(np.float32)
    fine = compute_fine_masks(**_fine_args(uv, np.zeros(n, np.int32), tex))
    assert fine.shape == (n, FINE_STRIDE)

    g = 48
    us, vs = np.meshgrid((np.arange(g) + 0.5) / g, (np.arange(g) + 0.5) / g)
    keep = (us + vs) < 1.0
    us, vs = us[keep].astype(np.float32), vs[keep].astype(np.float32)
    kept_any = opaque_any = 0
    for k in range(0, n, 5):
        pu = uv[k, 0, 0] + us * (uv[k, 1, 0] - uv[k, 0, 0]) \
            + vs * (uv[k, 2, 0] - uv[k, 0, 0])
        pv = uv[k, 0, 1] + us * (uv[k, 1, 1] - uv[k, 0, 1]) \
            + vs * (uv[k, 2, 1] - uv[k, 0, 1])
        alpha = _bilinear_alpha(tex, pu, pv)
        keep_b, opq_b = fine_mask_test(
            jnp.asarray(fine[k])[None, :], jnp.asarray(us),
            jnp.asarray(vs))
        keep_b, opq_b = np.asarray(keep_b), np.asarray(opq_b)
        assert (alpha[~keep_b] < 0.5).all(), f"non-conservative PASS {k}"
        assert (alpha[opq_b] >= 0.5).all(), f"non-conservative OPAQUE {k}"
        kept_any += int((~keep_b).sum())
        opaque_any += int(opq_b.sum())
    # The planes must actually bite on the leaf texture.
    assert kept_any > 0
    # (the serrated leaf texture has no fully-opaque cells by design;
    # probe the opaque plane with a solid texture instead)
    solid = np.full((16, 16, 4), 255, np.uint8)
    fine_s = compute_fine_masks(
        **_fine_args(uv[:4], np.zeros(4, np.int32), solid))
    ku, ou = fine_mask_test(jnp.asarray(fine_s[0])[None, :],
                            jnp.asarray(us), jnp.asarray(vs))
    assert np.asarray(ku).all() and np.asarray(ou).all()


def test_fine_mask_defaults_and_degenerates():
    uv = np.random.default_rng(0).uniform(0, 1, (6, 3, 2)).astype(np.float32)
    tex = np.full((4, 4, 4), 255, np.uint8)
    flags = np.array([0,                                   # not alpha-test
                      int(MaterialFlags.ALPHA_TEST),       # no texture
                      int(MaterialFlags.ALPHA_TEST)], np.int32)
    tex_ids = np.array([[0] * 5, [-1] * 5, [0, -1, -1, -1, -1]], np.int32)
    base = np.array([[1, 1, 1, 1], [1, 1, 1, 1], [1, 1, 1, 0.0]],
                    np.float32)
    params = np.tile(np.array([1, 0, 1, 1, 0.5], np.float32), (3, 1))
    fine = compute_fine_masks(uv, np.array([0, 1, 2, 0, 1, 2], np.int32),
                              base, params, tex_ids, flags, [tex])
    assert (fine[0] == -1).all()       # opaque material: pass + opaque
    assert (fine[1] == -1).all()       # alpha-test without texture
    assert (fine[2] == 0).all()        # alpha factor 0: reject everywhere


def test_fine_mask_test_matches_numpy_reference():
    rng = np.random.default_rng(3)
    words = rng.integers(-(1 << 31), 1 << 31, (512, FINE_STRIDE),
                         dtype=np.int64).astype(np.int32)
    u = rng.uniform(0, 1, 512).astype(np.float32)
    v = rng.uniform(0, 1, 512).astype(np.float32) * (1.0 - u)
    keep, opq = fine_mask_test(jnp.asarray(words), jnp.asarray(u),
                               jnp.asarray(v))
    ci = np.clip((u * FINE_GRID).astype(np.int64), 0, FINE_GRID - 1)
    cj = np.clip((v * FINE_GRID).astype(np.int64), 0, FINE_GRID - 1)
    cell = cj * FINE_GRID + ci - ((cj * (cj - 1)) >> 1)
    in_dom = (ci + cj) <= FINE_GRID - 1
    w64 = words.astype(np.int64) & 0xFFFFFFFF
    rows = np.arange(512)
    pw = w64[rows, cell >> 5]
    ow = w64[rows, FINE_WORDS + (cell >> 5)]
    want_keep = (((pw >> (cell & 31)) & 1) == 1) | ~in_dom
    want_opq = (((ow >> (cell & 31)) & 1) == 1) & in_dom
    assert (np.asarray(keep) == want_keep).all()
    assert (np.asarray(opq) == want_opq).all()
    assert FINE_CELLS <= FINE_WORDS * 32


def test_pack_fine_mask_rows_alignment():
    from steeljax.accel.bvh import TRI_PER_ROW
    from steeljax.accel.pallas_traverse import LANES, pack_fine_mask_rows
    rng = np.random.default_rng(1)
    t = 29
    fine = rng.integers(-(1 << 31), 1 << 31, (t, FINE_STRIDE),
                        dtype=np.int64).astype(np.int32)
    rows = pack_fine_mask_rows(fine)
    assert rows.shape == (-(-t // TRI_PER_ROW), LANES)
    assert rows.dtype == np.int32
    for k in range(t):
        r, j = divmod(k, TRI_PER_ROW)
        got = rows[r, FINE_STRIDE * j:FINE_STRIDE * (j + 1)]
        assert (got == fine[k]).all()
    # pad records reject everything (PASS plane zero)
    last = rows[-1, FINE_STRIDE * (t % TRI_PER_ROW):]
    assert (last == 0).all()
