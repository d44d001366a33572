"""Default textures and a file-backed texture cache.

Parity with Source/Engine/Render/Vulkan/Resources/TextureCache.cpp: the
default black/white/flat-normal/checkered textures (:36-47, :117-140) and
a path-keyed cache so shared images load once (the refcounting dissolves —
Python owns lifetime).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def black_texture(size: int = 4) -> np.ndarray:
    t = np.zeros((size, size, 4), np.uint8)
    t[..., 3] = 255
    return t


def white_texture(size: int = 4) -> np.ndarray:
    return np.full((size, size, 4), 255, np.uint8)


def flat_normal_texture(size: int = 4) -> np.ndarray:
    t = np.zeros((size, size, 4), np.uint8)
    t[..., 0] = 128
    t[..., 1] = 128
    t[..., 2] = 255
    t[..., 3] = 255
    return t


def checkered_texture(size: int = 16, cell: int = 4) -> np.ndarray:
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    check = ((xx // cell + yy // cell) % 2).astype(np.uint8)
    t = np.empty((size, size, 4), np.uint8)
    t[..., 0] = t[..., 1] = t[..., 2] = 64 + check * 191
    t[..., 3] = 255
    return t


class TextureCache:
    """Path -> decoded image cache (TextureCache::GetTexture)."""

    def __init__(self) -> None:
        self._cache: dict[str, np.ndarray] = {}

    def get(self, path: str | Path) -> np.ndarray:
        key = str(path)
        if key not in self._cache:
            from steeljax.io.image import load_ldr
            self._cache[key] = load_ldr(key)
        return self._cache[key]

    def __len__(self) -> int:
        return len(self._cache)
