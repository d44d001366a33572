"""Scene layer: GLTF loading, ECS-style scene container, flat device arrays.

TPU-native replacement for Source/Engine/Scene/ (entt registry, SceneLoader,
Primitive, Material, prefab system).
"""

from steeljax.scene.scene import (  # noqa: F401
    Entity, Light, LightType, RenderObject, Scene)
from steeljax.scene.material import Material, MaterialFlags  # noqa: F401
from steeljax.scene.primitive import Primitive  # noqa: F401
from steeljax.scene.loader import load_scene  # noqa: F401
from steeljax.scene.flatten import FlatScene, flatten_scene  # noqa: F401
