"""Systems: per-frame scene processors (System::Process(Scene&, float)).

CameraSystem mirrors Source/Engine/Scene/Systems/Private/CameraSystem.cpp:
yaw/pitch from mouse deltas (pitch clamped to +-89 deg), WASD/Space/Ctrl
movement along the camera frame with exponential speed keys 1-5, firing
CAMERA_UPDATE whenever the camera changed (which resets PT accumulation).

TestSystem mirrors Systems/Private/TestSystem.cpp's timed scripted demo:
t>8s instantiate the helmet prefab at the spawn point; t>12s erase the
prefab + add an orange point light; t>14s re-merge the prefab and
instantiate again, removing the light; t>18s remove the prefab + add a
cyan point light.
"""

from __future__ import annotations

import numpy as np

from steeljax.core import camera as camera_lib
from steeljax.engine.events import EventBus, EventType, KeyInput, MouseInput
from steeljax.scene.scene import Entity, Light, LightType, Scene


class System:
    def process(self, scene: Scene, delta_seconds: float) -> None:
        raise NotImplementedError


def _yaw_pitch(direction: np.ndarray) -> tuple[float, float]:
    yaw = np.arctan2(-direction[0], -direction[2])
    pitch = np.arcsin(np.clip(direction[1], -1.0, 1.0))
    return float(yaw), float(pitch)


def _direction_from(yaw: float, pitch: float) -> np.ndarray:
    cp = np.cos(pitch)
    return np.array([-np.sin(yaw) * cp, np.sin(pitch),
                     -np.cos(yaw) * cp], np.float32)


class CameraSystem(System):
    """Config::DefaultCamera::kSystemParameters defaults
    (Config.hpp:67-71)."""

    MOVEMENT_KEYS = {  # kMovementKeyBindings (Config.hpp:73-77)
        "w": ("forward", 1.0), "s": ("forward", -1.0),
        "a": ("left", 1.0), "d": ("left", -1.0),
        "space": ("up", 1.0), "ctrl": ("up", -1.0),
    }
    SPEED_KEYS = ["1", "2", "3", "4", "5"]

    def __init__(self, bus: EventBus, sensitivity: float = 1.0,
                 base_speed: float = 2.0, speed_multiplier: float = 4.0):
        self.sensitivity = sensitivity
        self.base_speed = base_speed
        self.speed_multiplier = speed_multiplier
        self.bus = bus
        self._axes = {"forward": 0.0, "left": 0.0, "up": 0.0}
        self._speed_index = 0.0
        self._yaw_pitch_delta = np.zeros(2, np.float32)
        self._rotation_enabled = False
        self._last_mouse: np.ndarray | None = None
        bus.add_handler(EventType.KEY_INPUT, self._on_key)
        bus.add_handler(EventType.MOUSE_MOVE, self._on_mouse_move)
        bus.add_handler(EventType.MOUSE_INPUT, self._on_mouse_input)

    def _on_key(self, event: KeyInput) -> None:
        if event.key in self.MOVEMENT_KEYS:
            axis, sign = self.MOVEMENT_KEYS[event.key]
            if event.action == "press":
                self._axes[axis] = sign
            elif event.action == "release" and self._axes[axis] == sign:
                self._axes[axis] = 0.0
        elif event.key in self.SPEED_KEYS and event.action == "press":
            self._speed_index = float(self.SPEED_KEYS.index(event.key))

    def _on_mouse_input(self, event: MouseInput) -> None:
        if event.button == "right":  # kControlMouseButton (Config.hpp:82)
            self._rotation_enabled = event.action == "press"
            self._last_mouse = None

    def _on_mouse_move(self, position) -> None:
        position = np.asarray(position, np.float32)
        if not self._rotation_enabled:
            self._last_mouse = position
            return
        if self._last_mouse is not None:
            delta = (position - self._last_mouse) * self.sensitivity
            self._yaw_pitch_delta += np.array(
                [-delta[0], -delta[1]], np.float32) * 0.001
        self._last_mouse = position

    def process(self, scene: Scene, delta_seconds: float) -> None:
        location = scene.camera_location
        changed = False

        yaw, pitch = _yaw_pitch(np.asarray(location.direction, np.float32))
        if np.any(self._yaw_pitch_delta != 0.0):
            yaw += float(self._yaw_pitch_delta[0])
            pitch = float(np.clip(pitch + self._yaw_pitch_delta[1],
                                  np.radians(-89.0), np.radians(89.0)))
            self._yaw_pitch_delta[:] = 0.0
            changed = True

        direction = _direction_from(yaw, pitch)
        position = np.asarray(location.position, np.float32)

        if any(v != 0.0 for v in self._axes.values()):
            forward = direction
            left = np.cross(np.array([0, 1, 0], np.float32), forward)
            left /= max(np.linalg.norm(left), 1e-8)
            up = np.array([0, 1, 0], np.float32)
            move = (self._axes["forward"] * forward
                    + self._axes["left"] * left + self._axes["up"] * up)
            norm = np.linalg.norm(move)
            if norm > 1e-8:
                speed = self.base_speed * (
                    self.speed_multiplier ** self._speed_index)
                position = position + move / norm * speed * delta_seconds
                changed = True

        if changed:
            scene.camera_location = camera_lib.CameraLocation(
                position=position, direction=direction,
                up=np.asarray(location.up, np.float32))
            self.bus.trigger(EventType.CAMERA_UPDATE)


class TestSystem(System):
    """Timed prefab/instance/light scenario (TestSystem.cpp:8-74)."""

    __test__ = False  # not a pytest class despite the name

    def __init__(self, prefab_name: str = "damaged_helmet",
                 spawn_name: str = "damaged_helmet_spawn",
                 prefab_loader=None):
        self.prefab_name = prefab_name
        self.spawn_name = spawn_name
        self.prefab_loader = prefab_loader  # () -> Scene, for re-merge
        self.time = 0.0
        self._instantiated = False
        self._erased = False
        self._remerged = False
        self._removed = False
        self._light_entity: int | None = None

    def _spawn_transform(self, scene: Scene) -> np.ndarray | None:
        try:
            return scene.world_transform(scene.find_entity(self.spawn_name))
        except KeyError:
            return None

    def _add_point_light(self, scene: Scene, color) -> int:
        transform = self._spawn_transform(scene)
        entity = Entity(name="test_light",
                        local_transform=np.asarray(transform, np.float32))
        entity.light = Light(type=LightType.POINT,
                             color=np.asarray(color, np.float32))
        return scene.add_entity(entity)

    def process(self, scene: Scene, delta_seconds: float) -> None:
        self.time += delta_seconds
        spawn = self._spawn_transform(scene)
        if spawn is None or self.prefab_name not in scene.prefabs and \
                not self._erased:
            if spawn is None:
                return

        if not self._instantiated and self.time > 8.0:
            scene.create_scene_instance(self.prefab_name, spawn)
            self._instantiated = True

        if not self._erased and self.time > 12.0:
            scene.erase_scene_prefab(self.prefab_name)
            self._erased = True
            self._light_entity = self._add_point_light(
                scene, (10.0, 5.0, 0.0))

        if self._erased and not self._remerged and self.time > 14.0 \
                and self.prefab_loader is not None:
            scene.emplace_scene_prefab(self.prefab_loader(),
                                       self.prefab_name)
            scene.create_scene_instance(self.prefab_name, spawn)
            self._remerged = True
            if self._light_entity is not None:
                scene.remove_entity(self._light_entity)
                self._light_entity = None

        if not self._removed and self.time > 18.0 and self._remerged:
            scene.erase_scene_prefab(self.prefab_name)
            self._removed = True
            self._light_entity = self._add_point_light(
                scene, (5.0, 10.0, 10.0))
