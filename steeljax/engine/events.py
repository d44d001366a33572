"""Typed event bus (Engine::TriggerEvent / AddEventHandler,
Source/Engine/Engine.hpp:18-30, 74-82).

The reference keys handlers on an EventType enum and casts std::any
payloads; here handlers subscribe per EventType and receive the payload
object directly.
"""

from __future__ import annotations

import dataclasses
import enum
from collections import defaultdict
from typing import Any, Callable

from steeljax.engine.input import (Key, KeyAction, ModifierFlags,
                                   MouseButton, MouseButtonAction)


class EventType(enum.Enum):
    """EngineHelpers.hpp EventType."""
    RESIZE = "resize"
    KEY_INPUT = "key_input"
    MOUSE_INPUT = "mouse_input"
    MOUSE_MOVE = "mouse_move"
    CAMERA_UPDATE = "camera_update"
    SCENE_OPEN = "scene_open"


def _norm_key(key) -> str:
    if isinstance(key, Key):
        return key.char or key.name.lower()
    return key


def _norm_action(action) -> str:
    if isinstance(action, (KeyAction, MouseButtonAction)):
        return action.value
    return action


@dataclasses.dataclass(frozen=True)
class KeyInput:
    """EngineHelpers.hpp KeyInput: key + action + modifiers.  Accepts the
    typed enums (engine.input.Key / KeyAction / ModifierFlags) or their
    plain-string forms; stores the normalized string so handlers compare
    either way."""
    key: str
    action: str = "press"  # press | release | repeat
    mods: frozenset | ModifierFlags = frozenset()

    def __post_init__(self):
        object.__setattr__(self, "key", _norm_key(self.key))
        object.__setattr__(self, "action", _norm_action(self.action))


@dataclasses.dataclass(frozen=True)
class MouseInput:
    button: str
    action: str = "press"
    mods: frozenset | ModifierFlags = frozenset()

    def __post_init__(self):
        if isinstance(self.button, MouseButton):
            object.__setattr__(self, "button", self.button.name.lower())
        object.__setattr__(self, "action", _norm_action(self.action))


class EventBus:
    def __init__(self) -> None:
        self._handlers: dict[EventType, list[Callable[[Any], None]]] = (
            defaultdict(list))

    def add_handler(self, event_type: EventType,
                    handler: Callable[[Any], None]) -> None:
        self._handlers[event_type].append(handler)

    def trigger(self, event_type: EventType, payload: Any = None) -> None:
        for handler in list(self._handlers[event_type]):
            handler(payload)
