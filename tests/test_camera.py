"""Camera matrix semantics: glm-compatible lookAt/perspective with Vulkan
Y-flip and reverse depth (CameraComponent.cpp:7-49)."""

import numpy as np

from steeljax.core import camera


def test_look_at_transforms_eye_to_origin():
    eye = np.array([1.0, 2.0, 3.0], np.float32)
    view = camera.look_at(eye, eye + np.array([0, 0, -1], np.float32),
                          np.array([0, 1, 0], np.float32))
    p = view @ np.array([*eye, 1.0], np.float32)
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-6)


def test_look_at_forward_maps_to_minus_z():
    eye = np.zeros(3, np.float32)
    direction = np.array([1.0, 0.0, 0.0], np.float32)
    view = camera.look_at(eye, direction, np.array([0, 1, 0], np.float32))
    p = view @ np.array([2.0, 0.0, 0.0, 1.0], np.float32)
    # A point ahead of the camera lands on -Z in view space (right-handed).
    np.testing.assert_allclose(p[:3], [0, 0, -2], atol=1e-6)


def test_perspective_depth_zero_to_one():
    proj = camera.perspective(np.radians(60.0), 1.0, 0.1, 100.0,
                              flip_y=False)

    def project(z):
        clip = proj @ np.array([0, 0, z, 1], np.float32)
        return clip[2] / clip[3]

    assert abs(project(-0.1)) < 1e-5       # near plane -> 0
    assert abs(project(-100.0) - 1.0) < 1e-5  # far plane -> 1


def test_reverse_depth_swaps_planes():
    proj = camera.projection_matrix(
        camera.CameraProjection(np.radians(60.0), 16, 9, 0.1, 100.0),
        reverse_depth=True)

    def project(z):
        clip = proj @ np.array([0, 0, z, 1], np.float32)
        return clip[2] / clip[3]

    assert abs(project(-0.1) - 1.0) < 1e-4  # near -> 1 under reverse z
    assert abs(project(-100.0)) < 1e-4      # far -> 0


def test_y_flip_for_vulkan_clip_space():
    proj = camera.perspective(np.radians(60.0), 1.0, 0.1, 100.0)
    up_point = proj @ np.array([0, 1, -1, 1], np.float32)
    # View-space up lands on negative clip Y — which is *up* on screen in
    # Vulkan's y-down NDC (the flip in CameraComponent.cpp:13).
    assert up_point[1] < 0
    no_flip = camera.perspective(np.radians(60.0), 1.0, 0.1, 100.0,
                                 flip_y=False)
    assert (no_flip @ np.array([0, 1, -1, 1], np.float32))[1] > 0


def test_frame_inverse_consistency():
    frame = camera.make_frame(camera.DEFAULT_LOCATION,
                              camera.DEFAULT_PROJECTION)
    np.testing.assert_allclose(frame.view @ frame.inverse_view,
                               np.eye(4), atol=1e-4)
    np.testing.assert_allclose(frame.proj @ frame.inverse_proj,
                               np.eye(4), atol=1e-4)
    np.testing.assert_allclose(
        frame.inverse_view[:3, 3], frame.camera_position, atol=1e-5)


def test_orthographic_when_fov_zero():
    proj = camera.projection_matrix(
        camera.CameraProjection(0.0, 20.0, 10.0, 0.1, 100.0),
        reverse_depth=False)
    edge = proj @ np.array([10.0, 0, -1, 1], np.float32)
    assert abs(edge[0] - 1.0) < 1e-5
