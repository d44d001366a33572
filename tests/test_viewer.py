"""Terminal viewer host (apps.viewer): ANSI frame encoding and the
stdin -> event-bus pump driving the stock CameraSystem/Engine handlers
(the Window.cpp:13-65 callback analog)."""

import os

import numpy as np
import pytest

from steeljax.apps.viewer import _pump, frame_to_ansi
from steeljax.core.config import RenderConfig
from steeljax.engine.engine import Engine
from steeljax.engine.systems import CameraSystem
from steeljax.scene.builtin import make_cornell_scene


def test_frame_to_ansi_half_blocks():
    frame = np.zeros((4, 3, 3), np.float32)
    frame[0, 0] = [1.0, 0.0, 0.0]   # top pixel of row 0, col 0
    frame[1, 2] = [0.0, 1.0, 0.0]   # bottom pixel of row 0, col 2
    text = frame_to_ansi(frame)
    lines = text.split("\n")
    assert len(lines) == 2                       # 4 px -> 2 cell rows
    assert lines[0].count("▀") == 3
    assert "\x1b[38;2;255;0;0m" in lines[0]      # fg = top pixel
    assert "\x1b[48;2;0;255;0m" in lines[0]      # bg = bottom pixel
    # Odd heights drop the last row instead of crashing.
    assert len(frame_to_ansi(frame[:3]).split("\n")) == 1


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="heavy render (RUN_SLOW=1 to enable)")
def test_pump_drives_camera_and_engine_keys():
    engine = Engine(make_cornell_scene(), 8, 8,
                    RenderConfig(width=8, height=8))
    camera = CameraSystem(engine.bus)
    engine.add_system(camera)
    scene = engine.scene
    before = np.asarray(scene.camera_location.position).copy()
    mode_before = engine.renderer.mode

    mouse = [0.0, 0.0]
    assert _pump(engine, camera, ["w", "t"], mouse)
    camera.process(scene, 0.25)
    after = np.asarray(scene.camera_location.position)
    assert not np.allclose(before, after), "w did not move the camera"
    assert engine.renderer.mode is not mode_before, "t did not toggle"

    # Arrow look: synthetic right-drag mouse move changes the direction.
    d_before = np.asarray(scene.camera_location.direction).copy()
    assert _pump(engine, camera, ["arrow_C"], mouse)
    camera.process(scene, 0.25)
    d_after = np.asarray(scene.camera_location.direction)
    assert not np.allclose(d_before, d_after), "arrow did not look"

    assert not _pump(engine, camera, ["q"], mouse)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="renders frames (RUN_SLOW=1 to enable)")
def test_viewer_scripted_session(capsys):
    from steeljax.apps.viewer import main

    rc = main(["builtin:cornell", "--size", "16x12", "--mode", "pt",
               "--frames", "2", "--keys", "w,t", "--cpu"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "▀" in out and "mode=HYBRID" in out
