"""Light-volume GI: probe placement, tets, SH projection, tet-walk
sampling, end-to-end bake on the tiny Cornell."""

import numpy as np
import jax.numpy as jnp
import pytest

from steeljax.gi import probes, sh, tets
from steeljax.gi.light_volume import LightVolume, generate_light_volume
from steeljax.gi.sample import sample_light_volume
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_cornell_scene


def test_geometry_oracle():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    oracle = probes.GeometryOracle(tri)
    assert oracle.contains_geometry(np.array([-1, -1, -1]),
                                    np.array([2, 2, 2]))
    assert not oracle.contains_geometry(np.array([5, 5, 5]),
                                        np.array([6, 6, 6]))


def test_probe_positions_cover_geometry():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    pos = probes.generate_probe_positions(tri, min_edge=0.5)
    assert len(pos) >= 8
    lo, hi = pos.min(0), pos.max(0)
    assert (lo <= 0).all() and (hi >= [1, 1, 0]).all()


def test_tetrahedralize_unit_cube():
    corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], np.float64)
    vertices, neighbors, matrices, used = tets.tetrahedralize(corners)
    assert len(vertices) >= 5
    # Barycentric coords of each tet's own centroid are all positive.
    for t in range(len(vertices)):
        centroid = used[vertices[t]].mean(axis=0)
        bary = tets.barycentric(used, vertices, matrices, t, centroid)
        np.testing.assert_allclose(bary, 0.25, atol=2e-3)
        np.testing.assert_allclose(bary.sum(), 1.0, atol=1e-3)


def test_sh_projection_constant_radiance():
    """A constant-radiance probe projects to DC only; the irradiance
    evaluation must return ~PI * c4-normalized constant."""
    cube = jnp.full((1, 6, 8, 8, 3), 1.0)
    coeffs = sh.project_sh9(cube, delta=0.1)
    c = np.asarray(coeffs)[0]
    # DC coefficient of a unit constant: 2*PI * 0.282095 * mean(sin) ...
    assert c[0].mean() > 0.5
    # Directional bands vanish for a constant environment.
    assert np.abs(c[1:4]).max() < 0.05
    # Evaluated irradiance is direction-independent.
    n1 = sh.eval_irradiance(jnp.asarray(c), jnp.asarray([0.0, 1.0, 0.0]))
    n2 = sh.eval_irradiance(jnp.asarray(c), jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=0.05)


def test_sh_basis_orthogonality():
    """Monte-Carlo check: int basis_i * basis_j over the sphere ~= delta_ij."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    b = np.asarray(sh.sh_basis(jnp.asarray(d, jnp.float32)))
    gram = 4 * np.pi * (b[:, :, None] * b[:, None, :]).mean(axis=0)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def _walk_volume():
    corners = np.array([[x, y, z] for x in (0, 2) for y in (0, 2)
                        for z in (0, 2)], np.float64)
    vertices, neighbors, matrices, used = tets.tetrahedralize(corners)
    coeffs = np.zeros((8, 9, 3), np.float32)
    # Encode each probe's x coordinate in its DC term.
    coeffs[:, 0, :] = used[:, :1].astype(np.float32) / 0.886227
    return LightVolume(
        positions=jnp.asarray(used, jnp.float32),
        tet_vertices=jnp.asarray(vertices),
        tet_neighbors=jnp.asarray(neighbors),
        tet_matrices=jnp.asarray(matrices),
        coefficients=jnp.asarray(coeffs))


def test_tet_walk_interpolates():
    lv = _walk_volume()
    p = jnp.asarray([[1.0, 1.0, 1.0], [0.5, 1.0, 1.0], [1.5, 0.5, 0.5]])
    n = jnp.asarray([[0.0, 0.0, 1.0]] * 3)
    out = np.asarray(sample_light_volume(lv, p, n))
    # DC-only volume: irradiance = c4 * dc = x coordinate of the sample.
    np.testing.assert_allclose(out[:, 0], [1.0, 0.5, 1.5], atol=0.05)


def test_tet_walk_outside_hull_is_black():
    lv = _walk_volume()
    p = jnp.asarray([[10.0, 10.0, 10.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(sample_light_volume(lv, p, n))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


@pytest.mark.slow
def test_end_to_end_bake():
    scene = make_cornell_scene(sphere_detail=4)
    flat, tables = prepare_scene(scene, env_resolution=16)
    lv = generate_light_volume(flat, tables, spp=1, resolution=8,
                               min_edge=4.0, max_probes=64)
    assert lv.positions.shape[0] >= 8
    assert lv.coefficients.shape[1:] == (9, 3)
    assert np.isfinite(np.asarray(lv.coefficients)).all()
    # Sampling inside the box yields finite, non-negative-ish irradiance.
    p = jnp.asarray([[0.0, 0.0, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    out = np.asarray(sample_light_volume(lv, p, n))
    assert np.isfinite(out).all()
