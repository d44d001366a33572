"""CPU-side mesh primitive with derived attributes.

Mirrors Source/Engine/Scene/Primitive.hpp:7-73 / Private/Primitive.cpp:
indices are uint32; missing normals are area-weighted face normals
(Primitive.cpp:11-41); missing tangents come from UV-space edge solves with
degenerate fallback tangent = +X (Primitive.cpp:43-96).  The per-primitive
BLAS of the reference becomes a per-scene LBVH built over the flattened
world-space triangles (steeljax.accel).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def compute_normals(indices: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (Primitive.cpp:11-41): face normals are
    normalized before accumulation, so weighting is by incident-face count
    direction, then renormalized."""
    tri = indices.reshape(-1, 3)
    p0, p1, p2 = (positions[tri[:, k]] for k in range(3))
    face = np.cross(p1 - p0, p2 - p0)
    norm = np.linalg.norm(face, axis=-1, keepdims=True)
    face = face / np.maximum(norm, 1e-20)
    normals = np.zeros_like(positions)
    for k in range(3):
        np.add.at(normals, tri[:, k], face)
    length = np.linalg.norm(normals, axis=-1, keepdims=True)
    return (normals / np.maximum(length, 1e-20)).astype(np.float32)


def compute_tangents(indices: np.ndarray, positions: np.ndarray,
                     tex_coords: np.ndarray) -> np.ndarray:
    """UV-gradient tangents (Primitive.cpp:43-96)."""
    tri = indices.reshape(-1, 3)
    p0, p1, p2 = (positions[tri[:, k]] for k in range(3))
    t0, t1, t2 = (tex_coords[tri[:, k]] for k in range(3))
    e1, e2 = p1 - p0, p2 - p0
    d1, d2 = t1 - t0, t2 - t0
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    det = np.where(det == 0.0, 1.0, det)
    tangent = (e1 * d2[:, 1:2] - e2 * d1[:, 1:2]) / det[:, None]
    tangents = np.zeros_like(positions)
    for k in range(3):
        np.add.at(tangents, tri[:, k], tangent)
    length = np.linalg.norm(tangents, axis=-1, keepdims=True)
    out = np.divide(tangents, length, out=np.zeros_like(tangents),
                    where=length > 0.0)
    degenerate = (length[:, 0] == 0.0)
    out[degenerate] = np.array([1.0, 0.0, 0.0], np.float32)
    return out.astype(np.float32)


@dataclasses.dataclass
class Primitive:
    indices: np.ndarray        # (I,) uint32
    positions: np.ndarray      # (V, 3) float32
    normals: np.ndarray        # (V, 3) float32
    tangents: np.ndarray       # (V, 3) float32
    tex_coords: np.ndarray     # (V, 2) float32

    @classmethod
    def create(cls, indices: np.ndarray, positions: np.ndarray,
               normals: np.ndarray | None = None,
               tangents: np.ndarray | None = None,
               tex_coords: np.ndarray | None = None) -> "Primitive":
        indices = np.ascontiguousarray(indices, np.uint32).reshape(-1)
        positions = np.ascontiguousarray(positions, np.float32)
        if tex_coords is None:
            tex_coords = np.zeros((len(positions), 2), np.float32)
        else:
            tex_coords = np.ascontiguousarray(tex_coords, np.float32)
        if normals is None:
            normals = compute_normals(indices, positions)
        else:
            normals = np.ascontiguousarray(normals, np.float32)
        if tangents is None:
            tangents = compute_tangents(indices, positions, tex_coords)
        else:
            tangents = np.ascontiguousarray(tangents, np.float32)
        return cls(indices=indices, positions=positions, normals=normals,
                   tangents=tangents, tex_coords=tex_coords)

    @property
    def triangle_count(self) -> int:
        return len(self.indices) // 3

    def aabb(self) -> tuple[np.ndarray, np.ndarray]:
        return self.positions.min(axis=0), self.positions.max(axis=0)


def make_uv_sphere(radius: float = 1.0, rings: int = 16,
                   sectors: int = 32) -> Primitive:
    """UV-sphere generator (MeshHelpers.cpp: GenerateSphere analog)."""
    ring = np.linspace(0.0, np.pi, rings + 1)
    sector = np.linspace(0.0, 2.0 * np.pi, sectors + 1)
    theta, phi = np.meshgrid(ring, sector, indexing="ij")
    x = np.sin(theta) * np.cos(phi)
    y = np.cos(theta)
    z = np.sin(theta) * np.sin(phi)
    positions = np.stack([x, y, z], axis=-1).reshape(-1, 3) * radius
    uv = np.stack([phi / (2 * np.pi), theta / np.pi], axis=-1).reshape(-1, 2)

    idx = []
    for i in range(rings):
        for j in range(sectors):
            a = i * (sectors + 1) + j
            b = a + sectors + 1
            # CCW seen from outside, so the geometric normal (cross of the
            # winding edges) points outward like the shading normals.
            idx += [a, a + 1, b, a + 1, b + 1, b]
    indices = np.array(idx, np.uint32)
    normals = positions / np.maximum(
        np.linalg.norm(positions, axis=-1, keepdims=True), 1e-20)
    return Primitive.create(indices, positions.astype(np.float32),
                            normals.astype(np.float32), None,
                            uv.astype(np.float32))
