"""GLTF document -> Scene assembly.

The SceneLoader analog (Source/Engine/Scene/Private/SceneLoader.cpp:371-608):
loads textures through a cache, builds material/primitive storages, walks the
node tree creating entities with render/camera/light components, and handles
the `extras` extensions (environment, scene_prefab, scene_instance,
scene_spawn).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from steeljax.core import camera as camera_lib
from steeljax.io import image as image_io
from steeljax.scene import gltf as gltf_lib
from steeljax.scene.material import material_from_gltf
from steeljax.scene.primitive import Primitive
from steeljax.scene.scene import Entity, Light, LightType, RenderObject, Scene

# "~/" means project root in the reference (Filepath.hpp); here it resolves
# against the directory of the scene being loaded or an explicit assets root.
_ASSETS_ROOT: Path | None = None


def set_assets_root(path: str | Path) -> None:
    global _ASSETS_ROOT
    _ASSETS_ROOT = Path(path)


def resolve_path(path: str, base_dir: Path) -> Path:
    if path.startswith("~/"):
        root = _ASSETS_ROOT
        if root is None:
            # Walk up from the scene dir to a directory containing Assets/.
            probe = base_dir
            while probe != probe.parent:
                if (probe / "Assets").is_dir():
                    root = probe
                    break
                probe = probe.parent
            else:
                root = base_dir
        return root / path[2:]
    return base_dir / path


def load_scene(path: str | Path) -> Scene:
    path = Path(path)
    doc = gltf_lib.load(path)
    scene = Scene()
    _populate(scene, doc, path.parent)
    return scene


def _populate(scene: Scene, doc: gltf_lib.GltfDocument, base_dir: Path) -> None:
    g = doc.json

    # Textures: GLTF texture table -> image arrays (TextureCache analog).
    image_cache: dict[int, int] = {}
    for tex in g.get("textures", []):
        src = tex.get("source", -1)
        if src in image_cache:
            continue
        data = doc.image_bytes(src)
        scene.textures.append(image_io.load_ldr(data))
        image_cache[src] = len(scene.textures) - 1
    texture_remap = [
        image_cache[t.get("source", -1)] for t in g.get("textures", [])
    ]

    # Materials.
    for m in g.get("materials", []):
        mat = material_from_gltf(m)
        for field in ("base_color_texture", "roughness_metallic_texture",
                      "normal_texture", "occlusion_texture",
                      "emission_texture"):
            v = getattr(mat, field)
            if v >= 0:
                setattr(mat, field, texture_remap[v])
        scene.materials.append(mat)

    # Primitives, flattened mesh-major exactly like the reference's
    # meshOffset bookkeeping (SceneLoader.cpp:527-546).
    mesh_prim_offset = []
    for mesh in g.get("meshes", []):
        mesh_prim_offset.append(len(scene.primitives))
        for prim in mesh["primitives"]:
            attrs = prim["attributes"]
            positions = doc.accessor(attrs["POSITION"]).astype(np.float32)
            indices = (doc.accessor(prim["indices"])[:, 0]
                       if "indices" in prim
                       else np.arange(len(positions), dtype=np.uint32))
            normals = (doc.accessor(attrs["NORMAL"]).astype(np.float32)
                       if "NORMAL" in attrs else None)
            tangents = None
            if "TANGENT" in attrs:
                t4 = doc.accessor(attrs["TANGENT"]).astype(np.float32)
                tangents = t4[:, :3]
            uvs = (doc.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                   if "TEXCOORD_0" in attrs else None)
            scene.primitives.append(
                Primitive.create(indices, positions, normals, tangents, uvs))

    # Node walk (SceneLoader.cpp:461-517).
    scene_def = g.get("scenes", [{}])[g.get("scene", 0)]
    spawns: list[tuple[str, int]] = []

    def walk(node_index: int, parent_entity: int) -> None:
        node = g["nodes"][node_index]
        entity = Entity(
            name=node.get("name"),
            local_transform=gltf_lib.node_local_transform(node),
            parent=parent_entity,
        )
        entity_index = scene.add_entity(entity)

        if "mesh" in node:
            mesh = g["meshes"][node["mesh"]]
            offset = mesh_prim_offset[node["mesh"]]
            entity.render_objects = [
                RenderObject(offset + i, prim.get("material", 0))
                for i, prim in enumerate(mesh["primitives"])
            ]

        if "camera" in node:
            _set_camera(scene, g["cameras"][node["camera"]], node)

        ext = node.get("extensions", {})
        if "KHR_lights_punctual" in ext:
            light_def = g["extensions"]["KHR_lights_punctual"]["lights"][
                ext["KHR_lights_punctual"]["light"]]
            color = np.asarray(light_def.get("color", [1, 1, 1]), np.float32)
            color = color * np.float32(light_def.get("intensity", 1.0))
            kind = (LightType.DIRECTIONAL
                    if light_def.get("type") == "directional"
                    else LightType.POINT)
            entity.light = Light(type=kind, color=color)

        extras = node.get("extras", {})
        if "environment" in extras:
            scene.environment_path = str(resolve_path(
                extras["environment"]["panorama_path"], base_dir))
        if "scene_prefab" in extras:
            prefab_path = resolve_path(extras["scene_prefab"], base_dir)
            sub = load_scene(prefab_path)
            scene.emplace_scene_prefab(sub, node.get("name", str(node_index)))
        if "scene_instance" in extras:
            spawns.append((extras["scene_instance"], entity_index))
        if "scene_spawn" in extras:
            spawns.append((extras["scene_spawn"], entity_index))

        for child in node.get("children", []):
            walk(child, entity_index)

    for root in scene_def.get("nodes", []):
        walk(root, -1)

    # scene_instance/scene_spawn resolve after the walk so prefabs declared
    # later in the node list still work.
    for prefab_name, entity_index in spawns:
        transform = scene.world_transform(entity_index)
        scene.create_scene_instance(prefab_name, transform)


def _set_camera(scene: Scene, camera_def: dict, node: dict) -> None:
    """RetrieveCameraLocation/Projection (SceneLoader.cpp:325-368)."""
    rotation = np.asarray(node.get("rotation", [0, 0, 0, 1]), np.float32)
    x, y, z, w = rotation
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    position = np.asarray(node.get("translation", [0, 0, 0]), np.float32)
    direction = rot @ camera_lib.FORWARD

    scene.camera_location = camera_lib.CameraLocation(
        position=position, direction=direction, up=camera_lib.UP)

    if camera_def.get("type") == "perspective":
        p = camera_def["perspective"]
        scene.camera_projection = camera_lib.CameraProjection(
            y_fov=float(p["yfov"]),
            width=float(p.get("aspectRatio", 16 / 9)), height=1.0,
            z_near=float(p.get("znear", 0.01)),
            z_far=float(p.get("zfar", 1000.0)))
    elif camera_def.get("type") == "orthographic":
        o = camera_def["orthographic"]
        scene.camera_projection = camera_lib.CameraProjection(
            y_fov=0.0, width=float(o["xmag"]), height=float(o["ymag"]),
            z_near=float(o["znear"]), z_far=float(o["zfar"]))
