"""Scene layer: GLTF loading, primitive derivation, prefab storage ops
(Scene.cpp:269-336 semantics)."""

from pathlib import Path

import numpy as np
import pytest

from steeljax.scene import (Entity, Material, RenderObject, Scene,
                            flatten_scene, load_scene)
from steeljax.scene.builtin import make_box, make_cornell_scene, make_quad
from steeljax.scene.primitive import (Primitive, compute_normals,
                                      compute_tangents)

CORNELL = Path("/root/reference/Assets/Scenes/CornellBox/CornellBox.gltf")


def test_compute_normals_flat_quad():
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                         np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    normals = compute_normals(indices, positions)
    np.testing.assert_allclose(normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_compute_tangents_follow_u_axis():
    positions = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                         np.float32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    tangents = compute_tangents(indices, positions, uvs)
    np.testing.assert_allclose(tangents, [[1, 0, 0]] * 4, atol=1e-5)


def test_degenerate_uv_tangent_fallback():
    positions = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uvs = np.zeros((3, 2), np.float32)
    tangents = compute_tangents(np.array([0, 1, 2], np.uint32), positions,
                                uvs)
    assert np.isfinite(tangents).all()


def test_builtin_cornell_flattens():
    scene = make_cornell_scene(sphere_detail=4)
    flat = flatten_scene(scene)
    assert flat.triangle_count > 80
    assert flat.mat_emission.max() == 1.0
    assert bool(flat.tri_double_sided.any())


def test_world_transform_hierarchy():
    scene = Scene()
    parent_tf = np.eye(4, dtype=np.float32)
    parent_tf[:3, 3] = [1, 0, 0]
    child_tf = np.eye(4, dtype=np.float32)
    child_tf[:3, 3] = [0, 2, 0]
    p = scene.add_entity(Entity(name="p", local_transform=parent_tf))
    c = scene.add_entity(Entity(name="c", local_transform=child_tf, parent=p))
    np.testing.assert_allclose(scene.world_transform(c)[:3, 3], [1, 2, 0])


def _tiny_scene(color):
    s = Scene()
    s.materials.append(Material(
        base_color_factor=np.array([*color, 1.0], np.float32)))
    s.primitives.append(make_quad(1.0))
    s.textures.append(np.zeros((2, 2, 4), np.uint8))
    s.materials[0].base_color_texture = 0
    s.add_entity(Entity(name="root",
                        render_objects=[RenderObject(0, 0)]))
    return s


def test_prefab_merge_instance_erase():
    host = _tiny_scene((1, 1, 1))
    sub = _tiny_scene((1, 0, 0))

    host.emplace_scene_prefab(sub, "thing")
    assert len(host.materials) == 2
    assert len(host.primitives) == 2
    # Merged material's texture index is offset past host textures.
    assert host.materials[1].base_color_texture == 1
    # Prefab-definition entities are storage-only.
    flat = flatten_scene(host)
    base_tris = flat.triangle_count

    tf = np.eye(4, dtype=np.float32)
    tf[:3, 3] = [5, 0, 0]
    host.create_scene_instance("thing", tf)
    flat2 = flatten_scene(host)
    assert flat2.triangle_count == base_tris + 2  # one more quad

    host.erase_scene_prefab("thing")
    assert len(host.materials) == 1
    assert len(host.primitives) == 1
    # The live instance survives erase in our model? No — instance render
    # objects referenced prefab storages, which were removed with it.
    flat3 = flatten_scene(host)
    assert flat3.triangle_count == 2


@pytest.mark.skipif(not CORNELL.exists(), reason="reference assets absent")
def test_load_reference_cornell():
    scene = load_scene(CORNELL)
    assert len(scene.materials) == 9  # 8 + merged helmet prefab
    assert "damaged_helmet" in scene.prefabs
    flat = flatten_scene(scene)
    assert flat.triangle_count > 10_000
    assert flat.light_count == 0
    # Camera comes from the GLTF camera node.
    np.testing.assert_allclose(scene.camera_location.position, [0, 0, 16])
    assert abs(scene.camera_projection.y_fov - 0.872664626) < 1e-6


@pytest.mark.skipif(not CORNELL.exists(), reason="reference assets absent")
def test_reference_helmet_prefab_has_textures():
    scene = load_scene(CORNELL)
    info = scene.prefabs["damaged_helmet"]
    assert info.textures.size == 5
    assert info.primitives.size == 1


def test_box_winding_outward():
    box = make_box(2.0)
    tri = box.indices.reshape(-1, 3)
    p = box.positions
    centers = p[tri].mean(axis=1)
    face_n = np.cross(p[tri[:, 1]] - p[tri[:, 0]], p[tri[:, 2]] - p[tri[:, 0]])
    # Outward winding: geometric normal points away from the origin.
    assert (np.einsum("ij,ij->i", face_n, centers) > 0).all()


def test_sphere_winding_outward():
    from steeljax.scene.primitive import make_uv_sphere
    sph = make_uv_sphere(1.0, 8, 16)
    tri = sph.indices.reshape(-1, 3)
    p = sph.positions
    e1 = p[tri[:, 1]] - p[tri[:, 0]]
    e2 = p[tri[:, 2]] - p[tri[:, 0]]
    face_n = np.cross(e1, e2)
    centers = p[tri].mean(axis=1)
    area = np.linalg.norm(face_n, axis=1)
    ok = area > 1e-8  # skip degenerate pole triangles
    dots = np.einsum("ij,ij->i", face_n[ok], centers[ok])
    assert (dots > 0).all(), "sphere winding must face outward"


def test_missing_buffer_names_the_dependency(tmp_path):
    """A GLTF whose external .bin is absent (the reference checkout's
    Sponza) fails with an error naming the missing file, not a bare
    open() traceback."""
    import json

    import pytest

    gltf = tmp_path / "s.gltf"
    gltf.write_text(json.dumps({
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "s.bin", "byteLength": 4}],
    }))
    from steeljax.scene import gltf as gltf_mod
    with pytest.raises(FileNotFoundError, match="GLTF buffer 's.bin'"):
        gltf_mod.load(gltf)
