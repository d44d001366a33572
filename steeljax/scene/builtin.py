"""Built-in procedural scenes (no asset files required).

`make_cornell_scene` reproduces the layout of the reference's default scene
(Assets/Scenes/CornellBox/CornellBox.gltf, Config.hpp:19): a 10-unit box
with green/red side walls, an emissive ceiling lamp, two boxes, and two
spheres.  Used by tests and the driver entry points so the framework is
exercisable without the reference checkout.
"""

from __future__ import annotations

import numpy as np

from steeljax.core import camera as camera_lib
from steeljax.scene.material import Material, MaterialFlags
from steeljax.scene.primitive import Primitive, make_uv_sphere
from steeljax.scene.scene import (Entity, Light, LightType, RenderObject,
                                  Scene)


def make_quad(size: float = 10.0) -> Primitive:
    """size x size quad in the XY plane facing +Z."""
    h = size * 0.5
    positions = np.array([[-h, -h, 0], [h, -h, 0], [h, h, 0], [-h, h, 0]],
                         np.float32)
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    normals = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    return Primitive.create(indices, positions, normals, None, uvs)


def make_box(size: float = 1.0) -> Primitive:
    """Axis-aligned cube with per-face normals, centered at origin."""
    h = size * 0.5
    faces = []
    idx = []
    normals = []
    uvs = []
    axes = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    base = 0
    for axis, u_ax, v_ax in axes:
        for sign in (1.0, -1.0):
            corners = []
            for du, dv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
                p = np.zeros(3, np.float32)
                p[axis] = sign * h
                p[u_ax] = du * h
                p[v_ax] = dv * h
                corners.append(p)
            n = np.zeros(3, np.float32)
            n[axis] = sign
            faces.extend(corners)
            normals.extend([n] * 4)
            uvs.extend([[0, 0], [1, 0], [1, 1], [0, 1]])
            if sign > 0:
                idx.extend([base, base + 1, base + 2, base, base + 2, base + 3])
            else:
                idx.extend([base, base + 2, base + 1, base, base + 3, base + 2])
            base += 4
    return Primitive.create(
        np.array(idx, np.uint32), np.array(faces, np.float32),
        np.array(normals, np.float32), None, np.array(uvs, np.float32))


def _trs(translation, rotation_axis=None, angle=0.0, scale=(1, 1, 1)):
    m = np.eye(4, dtype=np.float32)
    r = np.eye(3, dtype=np.float32)
    if rotation_axis is not None:
        axis = np.asarray(rotation_axis, np.float32)
        axis = axis / np.linalg.norm(axis)
        c, s = np.cos(angle), np.sin(angle)
        x, y, z = axis
        r = np.array([
            [c + x * x * (1 - c), x * y * (1 - c) - z * s,
             x * z * (1 - c) + y * s],
            [y * x * (1 - c) + z * s, c + y * y * (1 - c),
             y * z * (1 - c) - x * s],
            [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s,
             c + z * z * (1 - c)],
        ], np.float32)
    m[:3, :3] = r * np.asarray(scale, np.float32)[None, :]
    m[:3, 3] = translation
    return m


def make_cornell_scene(sphere_detail: int = 12) -> Scene:
    scene = Scene()

    def add_material(base_color, emission=0.0, metallic=0.0, roughness=1.0,
                     double_sided=True) -> int:
        flags = MaterialFlags.DOUBLE_SIDED if double_sided else (
            MaterialFlags.NONE)
        em = np.zeros(4, np.float32)
        em[:3] = emission
        scene.materials.append(Material(
            base_color_factor=np.array([*base_color, 1.0], np.float32),
            emission_factor=em,
            metallic_factor=metallic, roughness_factor=roughness,
            flags=flags))
        return len(scene.materials) - 1

    gray = add_material((1, 1, 1))
    green = add_material((0, 1, 0))
    red = add_material((1, 0, 0))
    lamp = add_material((1, 1, 1), emission=1.0)
    matte = add_material((0.7, 0.7, 0.7), roughness=0.6)
    metal = add_material((0.9, 0.9, 0.9), metallic=1.0, roughness=0.1)

    quad = 0
    scene.primitives.append(make_quad(10.0))
    box = 1
    scene.primitives.append(make_box(1.0))
    sphere = 2
    scene.primitives.append(
        make_uv_sphere(1.0, sphere_detail, sphere_detail * 2))

    half_pi = float(np.pi / 2)

    def add(name, prim, mat, transform):
        scene.add_entity(Entity(
            name=name, local_transform=transform,
            render_objects=[RenderObject(prim, mat)]))

    add("back_wall", quad, gray, _trs((0, 0, -5)))
    add("bottom_wall", quad, gray, _trs((0, -5, 0), (1, 0, 0), half_pi))
    add("top_wall", quad, gray, _trs((0, 5, 0), (1, 0, 0), half_pi))
    add("green_wall", quad, green, _trs((-5, 0, 0), (0, 1, 0), -half_pi))
    add("red_wall", quad, red, _trs((5, 0, 0), (0, 1, 0), -half_pi))
    add("lamp", quad, lamp,
        _trs((0, 4.75, 0), (1, 0, 0), half_pi, (0.25, 0.25, 1.0)))
    add("cube", box, matte,
        _trs((3.0, -3.5, 1.7), (0, 1, 0), 0.96, (2.5, 2.5, 2.5)))
    add("tall_cube", box, matte, _trs((-2.5, -2.0, -2.0), None, 0.0,
                                      (2.5, 6.0, 2.5)))
    add("metal_sphere", sphere, metal, _trs((-3.0, -4.0, 3.0)))
    add("matte_sphere", sphere, matte, _trs((3.3, -1.0, 0.0)))

    scene.camera_location = camera_lib.CameraLocation(
        position=np.array([0, 0, 16], np.float32),
        direction=np.array([0, 0, -1], np.float32),
        up=camera_lib.UP)
    scene.camera_projection = camera_lib.CameraProjection(
        y_fov=0.872664626, width=1.77777, height=1.0,
        z_near=0.01, z_far=100.0)
    return scene


def make_parity_scene(sphere_detail: int = 8) -> Scene:
    """Single-bounce-dominated scene for the PT-vs-hybrid numeric gate:
    an open ground plane + matte spheres under one directional light and
    the sky env.  With no enclosing geometry, multi-bounce transport (the
    part deferred split-sum lighting cannot represent) is a small fraction
    of the image, so the two pipelines must agree within a tight RMSE —
    unlike the emissive-lamp Cornell where hybrid has no light source."""
    scene = Scene()
    scene.materials.append(Material(
        base_color_factor=np.array([0.75, 0.75, 0.75, 1.0], np.float32),
        emission_factor=np.zeros(4, np.float32),
        metallic_factor=0.0, roughness_factor=0.9,
        flags=MaterialFlags.DOUBLE_SIDED))
    scene.materials.append(Material(
        base_color_factor=np.array([0.6, 0.3, 0.2, 1.0], np.float32),
        emission_factor=np.zeros(4, np.float32),
        metallic_factor=0.0, roughness_factor=0.7,
        flags=MaterialFlags.NONE))
    scene.primitives.append(make_quad(20.0))
    scene.primitives.append(
        make_uv_sphere(1.0, sphere_detail, sphere_detail * 2))

    half_pi = float(np.pi / 2)
    scene.add_entity(Entity(
        name="ground", local_transform=_trs((0, -1, 0), (1, 0, 0), half_pi),
        render_objects=[RenderObject(0, 0)]))
    scene.add_entity(Entity(
        name="sphere", local_transform=_trs((0, 0, 0)),
        render_objects=[RenderObject(1, 1)]))
    scene.add_entity(Entity(
        name="sphere2", local_transform=_trs((2.5, -0.4, -1.0), None, 0.0,
                                             (0.6, 0.6, 0.6)),
        render_objects=[RenderObject(1, 0)]))

    # Directional "sun": gather_lights takes -X of the world transform, so
    # rotate +X onto the desired direction (down-forward-left).
    sun = Entity(name="sun", local_transform=_trs((0, 0, 0), (0, 0, 1),
                                                  -2.2))
    sun.light = Light(type=LightType.DIRECTIONAL,
                      color=np.array([3.0, 2.9, 2.7], np.float32))
    scene.add_entity(sun)

    scene.camera_location = camera_lib.CameraLocation(
        position=np.array([0, 1.2, 6.0], np.float32),
        direction=np.array([0, -0.15, -1], np.float32),
        up=camera_lib.UP)
    scene.camera_projection = camera_lib.CameraProjection(
        y_fov=0.9, width=1.77777, height=1.0, z_near=0.01, z_far=100.0)
    return scene


def make_stress_scene(instances: int = 400, sphere_detail: int = 24) -> Scene:
    """Cornell box populated with a grid of instanced spheres/boxes —
    a multi-million-triangle synthetic workload standing in for San Miguel
    (the reference snapshot ships no large scene geometry)."""
    rng = np.random.default_rng(7)
    scene = make_cornell_scene(sphere_detail=sphere_detail)
    sphere = 2  # from make_cornell_scene
    box = 1
    side = int(np.ceil(instances ** (1 / 3)))
    count = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                if count >= instances:
                    break
                pos = (np.array([ix, iy, iz], np.float32) / max(side - 1, 1)
                       * 8.0 - 4.0)
                scale = 0.25 + 0.35 * rng.random()
                prim = sphere if (count % 3) else box
                mat = 4 + (count % 2)  # matte / metal
                scene.add_entity(Entity(
                    name=f"stress_{count}",
                    local_transform=_trs(pos, None, 0.0,
                                         (scale, scale, scale)),
                    render_objects=[RenderObject(prim, mat)]))
                count += 1
    return scene
