"""Axis-aligned bounding box utility (Source/Utils/AABBox.hpp:3-49)."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class AABBox:
    lo: np.ndarray = dataclasses.field(
        default_factory=lambda: np.full(3, np.inf, np.float32))
    hi: np.ndarray = dataclasses.field(
        default_factory=lambda: np.full(3, -np.inf, np.float32))

    @property
    def valid(self) -> bool:
        return bool((self.lo <= self.hi).all())

    @property
    def center(self) -> np.ndarray:
        return 0.5 * (self.lo + self.hi)

    @property
    def extent(self) -> np.ndarray:
        return self.hi - self.lo

    def corners(self) -> np.ndarray:
        """(8, 3) corner points."""
        out = np.empty((8, 3), np.float32)
        for i in range(8):
            out[i] = np.where([(i >> k) & 1 for k in range(3)],
                              self.hi, self.lo)
        return out

    def add_point(self, p) -> "AABBox":
        p = np.asarray(p, np.float32)
        return AABBox(np.minimum(self.lo, p), np.maximum(self.hi, p))

    def add(self, other: "AABBox") -> "AABBox":
        return AABBox(np.minimum(self.lo, other.lo),
                      np.maximum(self.hi, other.hi))

    def extend(self, amount: float) -> "AABBox":
        return AABBox(self.lo - amount, self.hi + amount)

    def transform(self, matrix: np.ndarray) -> "AABBox":
        """AABB of this box under a 4x4 transform (corner sweep)."""
        pts = self.corners() @ matrix[:3, :3].T + matrix[:3, 3]
        return AABBox(pts.min(axis=0).astype(np.float32),
                      pts.max(axis=0).astype(np.float32))

    def intersects(self, other: "AABBox") -> bool:
        return bool(((self.lo <= other.hi) & (self.hi >= other.lo)).all())

    def contains(self, p) -> bool:
        p = np.asarray(p)
        return bool(((p >= self.lo) & (p <= self.hi)).all())

    @classmethod
    def from_points(cls, points) -> "AABBox":
        points = np.asarray(points, np.float32).reshape(-1, 3)
        return cls(points.min(axis=0), points.max(axis=0))
