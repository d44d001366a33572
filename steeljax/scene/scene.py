"""Scene: a lightweight ECS-style container over numpy storages.

The entt::registry subclass of the reference (Source/Engine/Scene/Scene.hpp:
10-45) becomes plain Python: entities are dataclass records holding component
fields; shared storages (textures/materials/primitives) are Python lists that
flatten into device arrays (steeljax.scene.flatten).

The prefab system (Scene.cpp:269-336) is preserved: `emplace_scene_prefab`
merges a sub-scene's storages with index offsetting; `create_scene_instance`
clones the prefab's entity hierarchy under a transform; `erase_scene_prefab`
removes the prefab's storages and fixes up every other range.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from steeljax.core import camera as camera_lib
from steeljax.scene.material import Material
from steeljax.scene.primitive import Primitive


class LightType(enum.Enum):
    DIRECTIONAL = 0
    POINT = 1


@dataclasses.dataclass
class Light:
    type: LightType
    color: np.ndarray  # (3,) float32, already scaled by intensity


@dataclasses.dataclass
class RenderObject:
    primitive: int
    material: int


@dataclasses.dataclass
class Entity:
    name: str | None = None
    local_transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32))
    parent: int = -1
    render_objects: list[RenderObject] = dataclasses.field(default_factory=list)
    light: Light | None = None
    # Entities belonging to a prefab definition are storage-only: they are
    # cloned per instance but never rendered themselves (Scene.cpp:269-293).
    prefab_definition: str | None = None
    alive: bool = True


@dataclasses.dataclass
class StorageRange:
    """Half-open [offset, offset+size) range into a shared storage
    (Utils/Helpers.hpp:12-19 Range)."""
    offset: int = 0
    size: int = 0


@dataclasses.dataclass
class PrefabInfo:
    textures: StorageRange
    materials: StorageRange
    primitives: StorageRange
    root_entities: list[int]


class Scene:
    def __init__(self) -> None:
        self.textures: list[np.ndarray] = []      # (H, W, 4) uint8
        self.materials: list[Material] = []
        self.primitives: list[Primitive] = []
        self.entities: list[Entity] = []
        self.camera_location = camera_lib.DEFAULT_LOCATION
        self.camera_projection = camera_lib.DEFAULT_PROJECTION
        self.environment_path: str | None = None
        # Constant-radiance environment override (linear RGB); used as a
        # surrogate when a scene's panorama asset is unavailable (e.g. the
        # reference checkout ships no Assets/Environments).
        self.environment_color: tuple | None = None
        # Direct cubemap injection (6, R, R, 3) float32 — e.g. the fitted
        # SH-2 golden surrogate (apps.fit_env_surrogate); takes precedence
        # over environment_color in prepare_scene.
        self.environment_cube: np.ndarray | None = None
        self.prefabs: dict[str, PrefabInfo] = {}
        # Mutation counter: renderers re-flatten when this advances (the
        # on-demand analog of the reference's every-frame TLAS rebuild).
        self.revision: int = 0

    # ---- entities --------------------------------------------------------

    def add_entity(self, entity: Entity) -> int:
        self.entities.append(entity)
        self.revision += 1
        return len(self.entities) - 1

    def remove_entity(self, index: int) -> None:
        """Tombstone the entity and its descendants (Scene::RemoveEntity)."""
        doomed = {index}
        changed = True
        while changed:
            changed = False
            for i, e in enumerate(self.entities):
                if e.alive and e.parent in doomed and i not in doomed:
                    doomed.add(i)
                    changed = True
        for i in doomed:
            self.entities[i].alive = False
        self.revision += 1

    def find_entity(self, name: str) -> int:
        for i, e in enumerate(self.entities):
            if e.name == name:
                return i
        raise KeyError(name)

    def world_transform(self, index: int) -> np.ndarray:
        """Ancestor-walk world transform (Components.hpp TransformComponent)."""
        m = self.entities[index].local_transform
        parent = self.entities[index].parent
        while parent >= 0:
            m = self.entities[parent].local_transform @ m
            parent = self.entities[parent].parent
        return m

    # ---- prefab system (Scene.cpp:269-336) -------------------------------

    def emplace_scene_prefab(self, sub: "Scene", name: str) -> None:
        """Merge `sub`'s storages into this scene with index offsetting and
        remember the ranges; sub's entities become a storage-only hierarchy
        cloned by create_scene_instance."""
        tex_off = len(self.textures)
        mat_off = len(self.materials)
        prim_off = len(self.primitives)
        ent_off = len(self.entities)

        self.textures.extend(sub.textures)
        self.materials.extend(
            m.with_texture_offset(tex_off) for m in sub.materials)
        self.primitives.extend(sub.primitives)

        roots = []
        for i, e in enumerate(sub.entities):
            clone = dataclasses.replace(
                e,
                parent=e.parent + ent_off if e.parent >= 0 else -1,
                render_objects=[
                    RenderObject(ro.primitive + prim_off, ro.material + mat_off)
                    for ro in e.render_objects
                ],
                prefab_definition=name,
            )
            if e.parent < 0:
                roots.append(ent_off + i)
            self.entities.append(clone)

        self.revision += 1
        self.prefabs[name] = PrefabInfo(
            textures=StorageRange(tex_off, len(sub.textures)),
            materials=StorageRange(mat_off, len(sub.materials)),
            primitives=StorageRange(prim_off, len(sub.primitives)),
            root_entities=roots,
        )

    def create_scene_instance(self, name: str,
                              transform: np.ndarray) -> list[int]:
        """Clone the prefab's hierarchy as live (renderable) entities under
        `transform` (Scene.cpp CreateSceneInstance)."""
        info = self.prefabs[name]
        mapping: dict[int, int] = {}
        created: list[int] = []
        stack = list(info.root_entities)
        # Walk the prefab-definition subtree in hierarchy order.
        order: list[int] = []
        while stack:
            idx = stack.pop()
            order.append(idx)
            for j, e in enumerate(self.entities):
                if e.parent == idx and e.prefab_definition == name:
                    stack.append(j)
        for idx in order:
            src = self.entities[idx]
            is_root = idx in info.root_entities
            clone = dataclasses.replace(
                src,
                local_transform=(transform @ src.local_transform
                                 if is_root else src.local_transform.copy()),
                parent=-1 if is_root else mapping[src.parent],
                render_objects=list(src.render_objects),
                prefab_definition=None,
            )
            mapping[idx] = self.add_entity(clone)
            created.append(mapping[idx])
        return created

    def erase_scene_prefab(self, name: str) -> None:
        """Remove the prefab's storages + definition entities, fixing up all
        other indices (Scene.cpp:311-336)."""
        info = self.prefabs.pop(name)
        self.revision += 1

        def shift(value: int, rng: StorageRange) -> int:
            if value >= rng.offset + rng.size:
                return value - rng.size
            return value

        del self.textures[info.textures.offset:
                          info.textures.offset + info.textures.size]
        del self.materials[info.materials.offset:
                           info.materials.offset + info.materials.size]
        del self.primitives[info.primitives.offset:
                            info.primitives.offset + info.primitives.size]

        for mat in self.materials:
            for field in ("base_color_texture", "roughness_metallic_texture",
                          "normal_texture", "occlusion_texture",
                          "emission_texture"):
                v = getattr(mat, field)
                if v >= 0:
                    setattr(mat, field, shift(v, info.textures))

        def in_range(value: int, rng: StorageRange) -> bool:
            return rng.offset <= value < rng.offset + rng.size

        keep = [i for i, e in enumerate(self.entities)
                if e.prefab_definition != name]
        remap = {old: new for new, old in enumerate(keep)}
        new_entities = []
        for old in keep:
            e = self.entities[old]
            e.parent = remap.get(e.parent, -1) if e.parent >= 0 else -1
            # Live instances of the erased prefab lose the render objects
            # that referenced its storages.
            e.render_objects = [
                RenderObject(shift(ro.primitive, info.primitives),
                             shift(ro.material, info.materials))
                for ro in e.render_objects
                if not in_range(ro.primitive, info.primitives)
            ]
            new_entities.append(e)
        self.entities = new_entities

        for other in self.prefabs.values():
            for rng, removed in ((other.textures, info.textures),
                                 (other.materials, info.materials),
                                 (other.primitives, info.primitives)):
                if rng.offset >= removed.offset + removed.size:
                    rng.offset -= removed.size
            other.root_entities = [remap[r] for r in other.root_entities
                                   if r in remap]

    # ---- queries ---------------------------------------------------------

    def gather_lights(self) -> tuple[np.ndarray, np.ndarray]:
        """Pack lights into gpu::Light layout (SceneRenderer.cpp:77-118):
        directional location = -X axis of the world transform with w=0;
        point location = translation with w=1."""
        locations, colors = [], []
        for i, e in enumerate(self.entities):
            if e.light is None or e.prefab_definition is not None \
                    or not e.alive:
                continue
            world = self.world_transform(i)
            if e.light.type is LightType.DIRECTIONAL:
                axis = -world[:3, 0]
                loc = np.array([*axis, 0.0], np.float32)
            else:
                loc = np.array([*world[:3, 3], 1.0], np.float32)
            locations.append(loc)
            colors.append(np.array([*e.light.color, 0.0], np.float32))
        if not locations:
            return (np.zeros((0, 4), np.float32), np.zeros((0, 4), np.float32))
        return np.stack(locations), np.stack(colors)

    def renderable_entities(self) -> list[int]:
        return [i for i, e in enumerate(self.entities)
                if e.render_objects and e.prefab_definition is None
                and e.alive]
