"""Transform: a 4x4 matrix wrapper with TRS accessors.

Parity with Source/Engine/Scene/Transform.hpp:7-46: translation/rotation/
scale accessors, axis extraction, inverse, composition.  Rotations use
xyzw quaternions like GLTF/glm.
"""

from __future__ import annotations

import numpy as np


def quat_to_matrix(q) -> np.ndarray:
    x, y, z, w = np.asarray(q, np.float32)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def matrix_to_quat(r: np.ndarray) -> np.ndarray:
    """Rotation matrix -> xyzw quaternion (Shepperd's method)."""
    r = np.asarray(r, np.float64)
    tr = r[0, 0] + r[1, 1] + r[2, 2]
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        w = 0.25 * s
        x = (r[2, 1] - r[1, 2]) / s
        y = (r[0, 2] - r[2, 0]) / s
        z = (r[1, 0] - r[0, 1]) / s
    elif r[0, 0] > r[1, 1] and r[0, 0] > r[2, 2]:
        s = np.sqrt(1.0 + r[0, 0] - r[1, 1] - r[2, 2]) * 2
        w = (r[2, 1] - r[1, 2]) / s
        x = 0.25 * s
        y = (r[0, 1] + r[1, 0]) / s
        z = (r[0, 2] + r[2, 0]) / s
    elif r[1, 1] > r[2, 2]:
        s = np.sqrt(1.0 + r[1, 1] - r[0, 0] - r[2, 2]) * 2
        w = (r[0, 2] - r[2, 0]) / s
        x = (r[0, 1] + r[1, 0]) / s
        y = 0.25 * s
        z = (r[1, 2] + r[2, 1]) / s
    else:
        s = np.sqrt(1.0 + r[2, 2] - r[0, 0] - r[1, 1]) * 2
        w = (r[1, 0] - r[0, 1]) / s
        x = (r[0, 2] + r[2, 0]) / s
        y = (r[1, 2] + r[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w], np.float32)


class Transform:
    def __init__(self, matrix: np.ndarray | None = None):
        self.matrix = (np.eye(4, dtype=np.float32) if matrix is None
                       else np.asarray(matrix, np.float32))

    @classmethod
    def compose(cls, translation=(0, 0, 0), rotation=(0, 0, 0, 1),
                scale=(1, 1, 1)) -> "Transform":
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = quat_to_matrix(rotation) * np.asarray(
            scale, np.float32)[None, :]
        m[:3, 3] = translation
        return cls(m)

    @property
    def translation(self) -> np.ndarray:
        return self.matrix[:3, 3].copy()

    @property
    def scale(self) -> np.ndarray:
        return np.linalg.norm(self.matrix[:3, :3], axis=0).astype(np.float32)

    @property
    def rotation(self) -> np.ndarray:
        """xyzw quaternion of the rotation part."""
        s = self.scale
        r = self.matrix[:3, :3] / np.maximum(s[None, :], 1e-20)
        return matrix_to_quat(r)

    def axis(self, index: int) -> np.ndarray:
        """World-space basis axis (column `index`), normalized."""
        a = self.matrix[:3, index]
        return (a / max(np.linalg.norm(a), 1e-20)).astype(np.float32)

    def inverse(self) -> "Transform":
        return Transform(np.linalg.inv(self.matrix).astype(np.float32))

    def __matmul__(self, other: "Transform") -> "Transform":
        return Transform(self.matrix @ other.matrix)

    def apply(self, point) -> np.ndarray:
        p = np.asarray(point, np.float32)
        return (self.matrix[:3, :3] @ p + self.matrix[:3, 3]).astype(
            np.float32)
