"""Typed input surface (Source/Engine/InputHelpers.hpp:1-174).

The reference wraps GLFW's key/button/action/modifier codes in enums and a
Flags wrapper; steeljax is headless, but the full enum surface is kept so
systems and scripted drivers speak the same vocabulary (and so a windowed
front-end could be bolted on without touching the engine).  Key values are
the GLFW codes, matching InputHelpers.hpp exactly.
"""

from __future__ import annotations

import enum


class Key(enum.IntEnum):
    """InputHelpers.hpp `enum class Key` (GLFW key codes)."""
    UNKNOWN = -1
    SPACE = 32
    APOSTROPHE = 39
    COMMA = 44
    MINUS = 45
    PERIOD = 46
    SLASH = 47
    K0 = 48
    K1 = 49
    K2 = 50
    K3 = 51
    K4 = 52
    K5 = 53
    K6 = 54
    K7 = 55
    K8 = 56
    K9 = 57
    SEMICOLON = 59
    EQUAL = 61
    A = 65
    B = 66
    C = 67
    D = 68
    E = 69
    F = 70
    G = 71
    H = 72
    I = 73  # noqa: E741 - reference enum name
    J = 74
    K = 75
    L = 76
    M = 77
    N = 78
    O = 79  # noqa: E741 - reference enum name
    P = 80
    Q = 81
    R = 82
    S = 83
    T = 84
    U = 85
    V = 86
    W = 87
    X = 88
    Y = 89
    Z = 90
    LEFT_BRACKET = 91
    BACKSLASH = 92
    RIGHT_BRACKET = 93
    GRAVE_ACCENT = 96
    WORLD_1 = 161
    WORLD_2 = 162
    ESCAPE = 256
    ENTER = 257
    TAB = 258
    BACKSPACE = 259
    INSERT = 260
    DELETE = 261
    RIGHT = 262
    LEFT = 263
    DOWN = 264
    UP = 265
    PAGE_UP = 266
    PAGE_DOWN = 267
    HOME = 268
    END = 269
    CAPS_LOCK = 280
    SCROLL_LOCK = 281
    NUM_LOCK = 282
    PRINT_SCREEN = 283
    PAUSE = 284
    F1 = 290
    F2 = 291
    F3 = 292
    F4 = 293
    F5 = 294
    F6 = 295
    F7 = 296
    F8 = 297
    F9 = 298
    F10 = 299
    F11 = 300
    F12 = 301
    F13 = 302
    F14 = 303
    F15 = 304
    F16 = 305
    F17 = 306
    F18 = 307
    F19 = 308
    F20 = 309
    F21 = 310
    F22 = 311
    F23 = 312
    F24 = 313
    F25 = 314
    NUM_PAD_0 = 320
    NUM_PAD_1 = 321
    NUM_PAD_2 = 322
    NUM_PAD_3 = 323
    NUM_PAD_4 = 324
    NUM_PAD_5 = 325
    NUM_PAD_6 = 326
    NUM_PAD_7 = 327
    NUM_PAD_8 = 328
    NUM_PAD_9 = 329
    NUM_PAD_DECIMAL = 330
    NUM_PAD_DIVIDE = 331
    NUM_PAD_MULTIPLY = 332
    NUM_PAD_SUBTRACT = 333
    NUM_PAD_ADD = 334
    NUM_PAD_ENTER = 335
    NUM_PAD_EQUAL = 336
    LEFT_SHIFT = 340
    LEFT_CONTROL = 341
    LEFT_ALT = 342
    LEFT_SUPER = 343
    RIGHT_SHIFT = 344
    RIGHT_CONTROL = 345
    RIGHT_ALT = 346
    RIGHT_SUPER = 347
    MENU = 348

    @property
    def char(self) -> str | None:
        """Lower-case printable character for this key, or None."""
        if Key.SPACE <= self <= Key.GRAVE_ACCENT:
            return chr(int(self)).lower()
        return None

    @classmethod
    def from_char(cls, ch: str) -> "Key":
        """Key for a printable character ('w' -> Key.W); UNKNOWN if the
        character has no key."""
        try:
            return cls(ord(ch.upper()))
        except ValueError:
            return cls.UNKNOWN


class KeyAction(enum.Enum):
    """InputHelpers.hpp `enum class KeyAction`."""
    RELEASE = "release"
    PRESS = "press"
    REPEAT = "repeat"


class MouseButton(enum.IntEnum):
    """InputHelpers.hpp `enum class MouseButton`."""
    LEFT = 0
    RIGHT = 1
    MIDDLE = 2
    B4 = 3
    B5 = 4
    B6 = 5
    B7 = 6
    B8 = 7


class MouseButtonAction(enum.Enum):
    """InputHelpers.hpp `enum class MouseButtonAction`."""
    RELEASE = "release"
    PRESS = "press"


class ModifierFlags(enum.IntFlag):
    """InputHelpers.hpp ModifierFlagBits as a Flags bitset (the Flags<>
    wrapper + OVERLOAD_LOGIC_OPERATORS collapse to IntFlag in Python)."""
    NONE = 0
    SHIFT = 1 << 0
    CONTROL = 1 << 1
    ALT = 1 << 2
    SUPER = 1 << 3
    CAPS_LOCK = 1 << 4
    NUM_LOCK = 1 << 5
