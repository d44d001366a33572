"""Invariant validation layer (core.validate) — the validation-layers /
Assert.hpp analog: good structures pass, corrupted ones are caught."""

import numpy as np
import jax.numpy as jnp
import pytest

from steeljax.core import validate
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_cornell_scene


@pytest.fixture(scope="module")
def cornell_prepared():
    scene = make_cornell_scene(sphere_detail=4)
    return prepare_scene(scene, env_resolution=16)


def test_flat_scene_and_tables_pass(cornell_prepared):
    flat, tables = cornell_prepared
    validate.validate_flat_scene(flat)
    validate.validate_tables(tables, int(flat.tri_pos.shape[0]))


def test_corrupt_material_index_caught(cornell_prepared):
    flat, _ = cornell_prepared
    bad = flat.replace(tri_mat=flat.tri_mat.at[0].set(
        flat.mat_packed.shape[0] + 7))
    with pytest.raises(AssertionError, match="tri_mat"):
        validate.validate_flat_scene(bad)


def test_nonfinite_geometry_caught(cornell_prepared):
    flat, _ = cornell_prepared
    bad = flat.replace(tri_pos=flat.tri_pos.at[0, 0, 0].set(jnp.nan))
    with pytest.raises(AssertionError, match="non-finite"):
        validate.validate_flat_scene(bad)


def test_corrupt_bvh_child_caught(cornell_prepared):
    flat, tables = cornell_prepared
    bvh = tables.chunks[0].bvh
    nodes = np.asarray(bvh.nodes).copy()
    internal = np.nonzero(nodes[:, 7] == 0)[0]
    nodes[internal[0], 6] = nodes.shape[0] + 5  # child out of range
    with pytest.raises(AssertionError, match="child index"):
        validate.validate_bvh(bvh.replace(nodes=jnp.asarray(nodes)),
                              int(flat.tri_pos.shape[0]))


def test_misaligned_leaf_caught(cornell_prepared):
    flat, tables = cornell_prepared
    bvh = tables.chunks[0].bvh
    nodes = np.asarray(bvh.nodes).copy()
    leaves = np.nonzero(nodes[:, 7] > 0)[0]
    nodes[leaves[0], 6] += 5  # break row alignment
    with pytest.raises(AssertionError, match="row-aligned|overlapping"):
        validate.validate_bvh(bvh.replace(nodes=jnp.asarray(nodes)),
                              int(flat.tri_pos.shape[0]))


def test_release_mode_demotes_to_log(monkeypatch):
    monkeypatch.setenv("STEELJAX_DEBUG", "0")
    validate.steel_assert(False, "demoted")  # must not raise


def test_validation_toggle(monkeypatch):
    monkeypatch.setenv("STEELJAX_VALIDATE", "1")
    assert validate.validation_enabled()
    monkeypatch.delenv("STEELJAX_VALIDATE")
    assert not validate.validation_enabled()
