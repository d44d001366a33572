"""Cubemap direction tables, sampling roundtrip, panorama conversion."""

import numpy as np
import jax.numpy as jnp

from steeljax.env.cubemap import face_directions, sample_cube
from steeljax.env.panorama import panorama_to_cube


def test_face_directions_unit_and_centered():
    dirs = face_directions(8)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)
    # Center texels of an even-resolution face straddle the axis; the mean
    # of each face's directions is the face normal direction.
    mean = dirs.reshape(6, -1, 3).mean(axis=1)
    mean /= np.linalg.norm(mean, axis=-1, keepdims=True)
    expected = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                         [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    np.testing.assert_allclose(mean, expected, atol=1e-5)


def test_sample_roundtrip_at_texel_centers():
    res = 16
    cube = np.random.default_rng(0).uniform(
        0, 1, (6, res, res, 3)).astype(np.float32)
    dirs = face_directions(res)
    got = np.asarray(sample_cube(jnp.asarray(cube),
                                 jnp.asarray(dirs.reshape(-1, 3))))
    np.testing.assert_allclose(got, cube.reshape(-1, 3), atol=1e-4)


def test_axis_lookup():
    cube = np.zeros((6, 4, 4, 3), np.float32)
    for f in range(6):
        cube[f] = f + 1
    for f, d in enumerate([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]]):
        got = np.asarray(sample_cube(jnp.asarray(cube),
                                     jnp.asarray([d], jnp.float32)))
        np.testing.assert_allclose(got, f + 1, atol=1e-5)


def test_panorama_constant_color():
    pano = np.full((8, 16, 3), 0.75, np.float32)
    cube = np.asarray(panorama_to_cube(pano, 8))
    np.testing.assert_allclose(cube, 0.75, atol=1e-5)


def test_panorama_poles():
    """+Y cube face (up) samples the top panorama rows."""
    pano = np.zeros((32, 64, 3), np.float32)
    pano[:4] = 5.0  # bright top band
    cube = np.asarray(panorama_to_cube(pano, 8))
    # The reference flips Y when sampling the panorama
    # (PanoramaToCube.comp:36): up directions sample asin(-1) -> v ~ 0.
    up_face = cube[2]
    down_face = cube[3]
    assert up_face.mean() > down_face.mean()


def test_analytic_sky_matches_baked_cube():
    """The closed-form sky (env/sky.sky_radiance) IS the function the
    procedural cube bakes: at texel-center directions the baked cube and
    the analytic evaluation must agree exactly (modulo fp32 noise).  The
    render paths rely on this equivalence when env_analytic switches the
    miss/background lookup from a cubemap gather to the closed form."""
    from steeljax.env.sky import procedural_sky_cube, sky_radiance

    res = 16
    cube = procedural_sky_cube(res)
    dirs = face_directions(res).reshape(-1, 3)
    got = np.asarray(sky_radiance(jnp.asarray(dirs)))
    np.testing.assert_allclose(got, cube.reshape(-1, 3), rtol=1e-5,
                               atol=1e-5)


def test_tri_pack_matches_two_gather_trilinear():
    """pack_mips_tri / sample_flat_mips_tri (one row gather) must be
    BIT-exact with pack_mips / sample_flat_mips (two gathers) for random
    content, random directions, and every lod regime incl. the clamped
    ends and the last level's weight-0 self-pair."""
    from steeljax.env.cubemap import (pack_mips, pack_mips_tri,
                                      sample_flat_mips,
                                      sample_flat_mips_tri)
    from steeljax.env.ibl import build_cube_mips

    rng = np.random.default_rng(7)
    cube = jnp.asarray(rng.random((6, 16, 16, 3)), jnp.float32)
    mips = build_cube_mips(cube)
    data, offs, sizes = pack_mips(mips)
    tri, t_offs, t_sizes = pack_mips_tri(mips)
    np.testing.assert_array_equal(np.asarray(offs), np.asarray(t_offs))
    np.testing.assert_array_equal(np.asarray(sizes), np.asarray(t_sizes))

    dirs = rng.normal(size=(4096, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for lod in (rng.random(4096).astype(np.float32) * 5.5,
                np.zeros(4096, np.float32),
                np.full(4096, 4.0, np.float32),
                np.full(4096, 3.999, np.float32),
                np.full(4096, 9.0, np.float32)):
        a = sample_flat_mips(data, offs, sizes, jnp.asarray(dirs),
                             jnp.asarray(lod))
        c = sample_flat_mips_tri(tri, offs, sizes, jnp.asarray(dirs),
                                 jnp.asarray(lod))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
