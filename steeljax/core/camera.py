"""Camera: glm-compatible view/projection matrices and the per-frame
"Frame" uniform block.

The reference computes view matrices with glm::lookAt, perspective with a
Y-flip for Vulkan clip space, and swaps near/far for reverse depth
(Source/Engine/Scene/Components/Private/CameraComponent.cpp:7-49,
Source/Engine/Config.hpp:46 kReverseDepth=true).  The per-frame uniform
carries the six matrices + camera position + near/far
(Source/Shaders/Common/Common.h:47-60, SceneRenderer.cpp:146-177).

Matrices are built host-side in numpy float32 (they are jit constants or
small donated inputs); ray generation from them is jnp.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# Engine axis conventions (Source/Engine/EngineHelpers.hpp: kForward = -Z).
FORWARD = np.array([0.0, 0.0, -1.0], np.float32)
BACKWARD = -FORWARD
UP = np.array([0.0, 1.0, 0.0], np.float32)


@dataclasses.dataclass(frozen=True)
class CameraLocation:
    position: np.ndarray
    direction: np.ndarray
    up: np.ndarray


@dataclasses.dataclass(frozen=True)
class CameraProjection:
    y_fov: float  # radians; 0 => orthographic
    width: float
    height: float
    z_near: float
    z_far: float


# Config.hpp:50-66 defaults.
DEFAULT_LOCATION = CameraLocation(
    position=BACKWARD * 5.0, direction=FORWARD, up=UP)
DEFAULT_PROJECTION = CameraProjection(
    y_fov=float(np.radians(60.0)), width=16.0, height=9.0,
    z_near=0.01, z_far=1000.0)


def look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """glm::lookAtRH as a row-major 4x4 numpy float32 matrix (applied as
    M @ column_vector)."""
    eye = np.asarray(eye, np.float32)
    f = np.asarray(center, np.float32) - eye
    f = f / np.linalg.norm(f)
    up = np.asarray(up, np.float32)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective(y_fov: float, aspect: float, z_near: float,
                z_far: float, flip_y: bool = True) -> np.ndarray:
    """glm::perspectiveRH_ZO (depth 0..1) with the Vulkan Y flip the
    reference applies (CameraComponent.cpp:7-16)."""
    tan_half = np.tan(0.5 * y_fov)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 1.0 / (aspect * tan_half)
    m[1, 1] = 1.0 / tan_half
    m[2, 2] = z_far / (z_near - z_far)
    m[2, 3] = -(z_far * z_near) / (z_far - z_near)
    m[3, 2] = -1.0
    if flip_y:
        m[1, 1] = -m[1, 1]
    return m


def orthographic(width: float, height: float, z_near: float,
                 z_far: float, flip_y: bool = True) -> np.ndarray:
    """glm::orthoRH_ZO centered at the origin with Vulkan Y flip
    (CameraComponent.cpp:18-28)."""
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = 2.0 / width
    m[1, 1] = 2.0 / height
    m[2, 2] = -1.0 / (z_far - z_near)
    m[2, 3] = -z_near / (z_far - z_near)
    if flip_y:
        m[1, 1] = -m[1, 1]
    return m


def projection_matrix(proj: CameraProjection,
                      reverse_depth: bool = True) -> np.ndarray:
    """ComputeProjMatrix (CameraComponent.cpp:36-49): swap near/far when
    reverse depth; ortho when y_fov == 0."""
    z_near = proj.z_far if reverse_depth else proj.z_near
    z_far = proj.z_near if reverse_depth else proj.z_far
    if proj.y_fov == 0.0:
        return orthographic(proj.width, proj.height, z_near, z_far)
    return perspective(proj.y_fov, proj.width / proj.height, z_near, z_far)


def view_matrix(location: CameraLocation) -> np.ndarray:
    return look_at(location.position,
                   np.asarray(location.position) + np.asarray(location.direction),
                   location.up)


@dataclasses.dataclass(frozen=True)
class Frame:
    """The gpu::Frame uniform (Common.h:47-60) as numpy float32 arrays."""

    view: np.ndarray
    proj: np.ndarray
    view_proj: np.ndarray
    inverse_view: np.ndarray
    inverse_proj: np.ndarray
    inverse_proj_view: np.ndarray
    camera_position: np.ndarray
    camera_near: float
    camera_far: float
    global_time: float = 0.0


def make_frame(location: CameraLocation, proj: CameraProjection,
               reverse_depth: bool = True, global_time: float = 0.0) -> Frame:
    view = view_matrix(location)
    projection = projection_matrix(proj, reverse_depth)
    inverse_view = np.linalg.inv(view).astype(np.float32)
    inverse_proj = np.linalg.inv(projection).astype(np.float32)
    return Frame(
        view=view,
        proj=projection,
        view_proj=(projection @ view).astype(np.float32),
        inverse_view=inverse_view,
        inverse_proj=inverse_proj,
        inverse_proj_view=(inverse_view @ inverse_proj).astype(np.float32),
        camera_position=np.asarray(location.position, np.float32),
        camera_near=float(proj.z_near),
        camera_far=float(proj.z_far),
        global_time=float(global_time),
    )
