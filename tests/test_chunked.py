"""Chunked tracing: splitting a scene into sub-BVHs must not change any
hit result (dispatch.prepare_tables with a tiny max_chunk vs one chunk)."""

import numpy as np
import jax.numpy as jnp

from steeljax.accel.bvh import apply_permutation
from steeljax.accel.dispatch import prepare_tables, trace_any, trace_nearest


def _soup(n, seed):
    r = np.random.default_rng(seed)
    centers = r.uniform(-10, 10, (n, 1, 3))
    return (centers + r.normal(0, 0.7, (n, 3, 3))).astype(np.float32)


def _prep(tris, ds, max_chunk):
    tables, order, padded = prepare_tables(
        tris, ds, leaf_size=16, max_chunk=max_chunk, use_pallas=False)
    perm = apply_permutation((None, order, padded),
                             {"pos": tris, "ds": ds})
    return tables, jnp.asarray(perm["pos"]), jnp.asarray(perm["ds"])


def test_chunked_matches_single():
    tris = _soup(3000, 1)
    ds = np.zeros(len(tris), bool)
    r = np.random.default_rng(2)
    n = 256
    o = r.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    t_single, tables_pos = None, None
    single, spos, sds = _prep(tris, ds, max_chunk=10_000)
    assert len(single.chunks) == 1
    chunked, cpos, cds = _prep(tris, ds, max_chunk=500)
    assert len(chunked.chunks) >= 6

    a = trace_nearest(single, spos, sds, o, d, 0.001, 1000.0,
                      cull_backface=False)
    b = trace_nearest(chunked, cpos, cds, o, d, 0.001, 1000.0,
                      cull_backface=False)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-4)
    # Triangle ids index different permutations; verify the actual hit
    # geometry matches by comparing hit points' distances only (above) and
    # the resolved world positions.
    ha = np.asarray(a["hit"])
    pa = np.asarray(spos)[np.maximum(np.asarray(a["tri"]), 0)]
    pb = np.asarray(cpos)[np.maximum(np.asarray(b["tri"]), 0)]
    np.testing.assert_allclose(pa[ha].min(axis=(1, 2)),
                               pb[ha].min(axis=(1, 2)), atol=1e-4)

    occ_a = np.asarray(trace_any(single, spos, sds, o, d, 0.001, 1000.0))
    occ_b = np.asarray(trace_any(chunked, cpos, cds, o, d, 0.001, 1000.0))
    np.testing.assert_array_equal(occ_a, occ_b)


def test_multichunk_fused_mode2_template():
    """Regression: the multi-chunk lax.cond skip template must match the
    fused shade_mode-2 record structure (incl. 'uvd'), or tracing raises a
    pytree-structure TypeError.  Exercised abstractly (eval_shape) so the
    Pallas path is checked without TPU hardware."""
    import jax
    from steeljax.accel.dispatch import attach_shade_tables

    tris = _soup(64, 3)
    ds = np.zeros(len(tris), bool)
    tables, order, padded = prepare_tables(
        tris, ds, leaf_size=8, max_chunk=24, use_pallas=True)
    assert len(tables.chunks) > 1
    nrm = np.zeros((padded, 3, 3), np.float32)
    nrm[..., 2] = 1.0
    tan = np.zeros((padded, 3, 3), np.float32)
    tan[..., 0] = 1.0
    uv = np.zeros((padded, 3, 2), np.float32)
    mat = np.zeros((padded,), np.int32)
    uvd = np.ones((padded,), np.float32)
    tables = attach_shade_tables(tables, nrm, tan, uv, mat, textured=True,
                                 tri_uvd=uvd)
    assert tables.shade_mode == 2
    o = jnp.zeros((16, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (16, 1))
    out = jax.eval_shape(
        lambda o, d: trace_nearest(tables, None, None, o, d, 0.001, 1000.0),
        o, d)
    assert set(out) >= {"t", "tri", "hit", "n", "mat", "tan", "uv", "uvd"}


def test_chunked_render_smoke():
    """End-to-end render with forced chunking (CPU)."""
    import steeljax.accel.dispatch as dispatch
    from steeljax.core import camera as camera_lib
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.integrator import render_sample
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import make_cornell_scene

    old = dispatch.MAX_CHUNK_TRIS
    try:
        dispatch.MAX_CHUNK_TRIS = 50
        scene = make_cornell_scene(sphere_detail=4)
        flat, tables = prepare_scene(scene, env_resolution=8)
        assert len(tables.chunks) > 1
        frame = camera_lib.make_frame(scene.camera_location,
                                      scene.camera_projection)
        img = np.asarray(render_sample(
            flat, tables, jnp.asarray(frame.inverse_view),
            jnp.asarray(frame.inverse_proj), frame.camera_near,
            frame.camera_far, 16, 12, 0, 0,
            RenderConfig(width=16, height=12)))
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
    finally:
        dispatch.MAX_CHUNK_TRIS = old
