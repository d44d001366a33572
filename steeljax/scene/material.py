"""Material model: gpu::Material fields + MaterialFlags.

Mirrors Source/Engine/Scene/Material.hpp:11-40 and the flag derivation in
SceneLoader.cpp:227-243 (alphaMode/doubleSided/normalTexture).  Texture
indices use -1 for "absent" exactly like the reference's shader contract.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np


class MaterialFlags(enum.IntFlag):
    NONE = 0
    ALPHA_TEST = 1
    ALPHA_BLEND = 2
    DOUBLE_SIDED = 4
    NORMAL_MAPPING = 8


@dataclasses.dataclass
class Material:
    base_color_factor: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(4, np.float32))
    emission_factor: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4, np.float32))
    base_color_texture: int = -1
    roughness_metallic_texture: int = -1
    normal_texture: int = -1
    occlusion_texture: int = -1
    emission_texture: int = -1
    roughness_factor: float = 1.0
    metallic_factor: float = 1.0
    normal_scale: float = 1.0
    occlusion_strength: float = 1.0
    alpha_cutoff: float = 0.5
    flags: MaterialFlags = MaterialFlags.NONE

    @property
    def double_sided(self) -> bool:
        return bool(self.flags & MaterialFlags.DOUBLE_SIDED)

    @property
    def alpha_test(self) -> bool:
        return bool(self.flags & MaterialFlags.ALPHA_TEST)

    @property
    def alpha_blend(self) -> bool:
        return bool(self.flags & MaterialFlags.ALPHA_BLEND)

    def with_texture_offset(self, offset: int) -> "Material":
        """Shift all texture indices by `offset` (prefab storage merge,
        reference Material.cpp:41-111)."""
        out = dataclasses.replace(self)
        for field in ("base_color_texture", "roughness_metallic_texture",
                      "normal_texture", "occlusion_texture",
                      "emission_texture"):
            value = getattr(out, field)
            if value >= 0:
                setattr(out, field, value + offset)
        return out


def material_from_gltf(gltf_material: dict) -> Material:
    """RetrieveMaterial (SceneLoader.cpp:202-243)."""
    pbr = gltf_material.get("pbrMetallicRoughness", {})

    def tex_index(entry: dict | None) -> int:
        return entry["index"] if entry else -1

    flags = MaterialFlags.NONE
    if gltf_material.get("alphaMode") == "MASK":
        flags |= MaterialFlags.ALPHA_TEST
    if gltf_material.get("alphaMode") == "BLEND":
        flags |= MaterialFlags.ALPHA_BLEND
    if gltf_material.get("doubleSided"):
        flags |= MaterialFlags.DOUBLE_SIDED
    if "normalTexture" in gltf_material:
        flags |= MaterialFlags.NORMAL_MAPPING

    emission = np.zeros(4, np.float32)
    emission[:3] = np.asarray(
        gltf_material.get("emissiveFactor", [0, 0, 0]), np.float32)

    return Material(
        base_color_factor=np.asarray(
            pbr.get("baseColorFactor", [1, 1, 1, 1]), np.float32),
        emission_factor=emission,
        base_color_texture=tex_index(pbr.get("baseColorTexture")),
        roughness_metallic_texture=tex_index(
            pbr.get("metallicRoughnessTexture")),
        normal_texture=tex_index(gltf_material.get("normalTexture")),
        occlusion_texture=tex_index(gltf_material.get("occlusionTexture")),
        emission_texture=tex_index(gltf_material.get("emissiveTexture")),
        roughness_factor=float(pbr.get("roughnessFactor", 1.0)),
        metallic_factor=float(pbr.get("metallicFactor", 1.0)),
        normal_scale=float(
            gltf_material.get("normalTexture", {}).get("scale", 1.0)),
        occlusion_strength=float(
            gltf_material.get("occlusionTexture", {}).get("strength", 1.0)),
        alpha_cutoff=float(gltf_material.get("alphaCutoff", 0.5)),
        flags=flags,
    )
