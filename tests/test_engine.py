"""Engine shell: event bus, camera system, test-system scenario, loop."""

import numpy as np
import pytest

from steeljax.core import camera as camera_lib
from steeljax.core.config import RenderConfig
from steeljax.engine import CameraSystem, Engine, EventBus, EventType, TestSystem
from steeljax.engine.events import KeyInput, MouseInput
from steeljax.engine.systems import _direction_from, _yaw_pitch
from steeljax.env.environment import load_environment
from steeljax.env.sky import procedural_sky_cube
from steeljax.scene.builtin import make_cornell_scene
from steeljax.scene.scene import Entity, RenderObject, Scene
import pytest as _pytest


@_pytest.fixture(scope="module")
def tiny_env():
    return load_environment(
        cube=procedural_sky_cube(16), irradiance_resolution=4,
        reflection_resolution=8, lut_resolution=16, lut_samples=32,
        reflection_samples=16, irradiance_delta=0.4)


def test_event_bus_dispatch():
    bus = EventBus()
    seen = []
    bus.add_handler(EventType.KEY_INPUT, seen.append)
    bus.trigger(EventType.KEY_INPUT, KeyInput("w"))
    bus.trigger(EventType.CAMERA_UPDATE)  # no handler: no error
    assert seen == [KeyInput("w")]


def test_yaw_pitch_roundtrip():
    for d in ([0, 0, -1], [1, 0, 0], [0.3, 0.5, -0.8]):
        d = np.asarray(d, np.float32)
        d /= np.linalg.norm(d)
        yaw, pitch = _yaw_pitch(d)
        np.testing.assert_allclose(_direction_from(yaw, pitch), d, atol=1e-5)


def test_camera_system_moves_forward():
    bus = EventBus()
    cam = CameraSystem(bus, base_speed=2.0)
    scene = Scene()
    start = np.asarray(scene.camera_location.position).copy()
    fired = []
    bus.add_handler(EventType.CAMERA_UPDATE, fired.append)

    bus.trigger(EventType.KEY_INPUT, KeyInput("w", "press"))
    cam.process(scene, 0.5)
    moved = np.asarray(scene.camera_location.position)
    # Default camera faces -Z; W moves forward at base_speed.
    np.testing.assert_allclose(moved, start + [0, 0, -1.0], atol=1e-5)
    assert fired

    bus.trigger(EventType.KEY_INPUT, KeyInput("w", "release"))
    cam.process(scene, 0.5)
    np.testing.assert_allclose(np.asarray(scene.camera_location.position),
                               moved, atol=1e-6)


def test_camera_system_speed_keys():
    bus = EventBus()
    cam = CameraSystem(bus, base_speed=1.0, speed_multiplier=4.0)
    scene = Scene()
    bus.trigger(EventType.KEY_INPUT, KeyInput("3", "press"))  # index 2
    bus.trigger(EventType.KEY_INPUT, KeyInput("w", "press"))
    start = np.asarray(scene.camera_location.position).copy()
    cam.process(scene, 1.0)
    dist = np.linalg.norm(
        np.asarray(scene.camera_location.position) - start)
    assert abs(dist - 16.0) < 1e-3  # 1.0 * 4**2


def test_camera_system_mouse_rotation():
    bus = EventBus()
    cam = CameraSystem(bus)
    scene = Scene()
    bus.trigger(EventType.MOUSE_INPUT, MouseInput("right", "press"))
    bus.trigger(EventType.MOUSE_MOVE, (0.0, 0.0))
    bus.trigger(EventType.MOUSE_MOVE, (200.0, 0.0))
    cam.process(scene, 0.1)
    d = np.asarray(scene.camera_location.direction)
    assert abs(d[0]) > 0.01  # yawed away from straight -Z


def _scene_with_prefab():
    host = Scene()
    sub = Scene()
    from steeljax.scene.builtin import make_quad
    from steeljax.scene.material import Material
    sub.materials.append(Material())
    sub.primitives.append(make_quad(1.0))
    sub.add_entity(Entity(name="thing_root",
                          render_objects=[RenderObject(0, 0)]))
    host.emplace_scene_prefab(sub, "damaged_helmet")
    spawn = Entity(name="damaged_helmet_spawn")
    host.add_entity(spawn)
    return host, sub


def test_test_system_scenario():
    scene, sub = _scene_with_prefab()

    def reload():
        s2 = Scene()
        from steeljax.scene.builtin import make_quad
        from steeljax.scene.material import Material
        s2.materials.append(Material())
        s2.primitives.append(make_quad(1.0))
        s2.add_entity(Entity(name="thing_root",
                             render_objects=[RenderObject(0, 0)]))
        return s2

    ts = TestSystem(prefab_loader=reload)
    base = len(scene.renderable_entities())

    ts.process(scene, 9.0)   # t=9: instance created
    assert len(scene.renderable_entities()) == base + 1

    ts.process(scene, 4.0)   # t=13: prefab erased (+ light)
    assert "damaged_helmet" not in scene.prefabs
    assert scene.gather_lights()[0].shape[0] == 1

    ts.process(scene, 2.0)   # t=15: re-merged + instanced, light removed
    assert "damaged_helmet" in scene.prefabs
    assert scene.gather_lights()[0].shape[0] == 0

    ts.process(scene, 4.0)   # t=19: removed again + cyan light
    assert "damaged_helmet" not in scene.prefabs
    assert scene.gather_lights()[0].shape[0] == 1


def test_engine_tick_renders_and_refreshes(tiny_env):
    scene = make_cornell_scene(sphere_detail=4)
    engine = Engine(scene, 16, 9, RenderConfig(width=16, height=9),
                    environment=tiny_env)
    frame = engine.tick(1 / 30)
    assert frame.shape == (9, 16, 3)
    # Mutating the scene triggers a re-flatten on the next tick.
    before = engine.renderer.path_tracer.flat.triangle_count
    from steeljax.scene.builtin import make_box
    scene.primitives.append(make_box(1.0))
    scene.add_entity(Entity(name="extra", render_objects=[
        RenderObject(len(scene.primitives) - 1, 0)]))
    frame = engine.tick(1 / 30)
    after = engine.renderer.path_tracer.flat.triangle_count
    assert after >= before  # padded count can stay equal; at least no crash
    assert np.isfinite(frame).all()


def test_engine_instanced_refresh(tiny_env):
    """Engine(instancing=True): scene revisions re-prepare through the
    cached-BLAS path (zero BLAS rebuilds for transform edits) and both
    renderers keep producing finite frames."""
    scene = make_cornell_scene(sphere_detail=4)
    engine = Engine(scene, 16, 9, RenderConfig(width=16, height=9),
                    environment=tiny_env, instancing=True)
    frame = engine.tick(1 / 30)
    assert frame.shape == (9, 16, 3) and np.isfinite(frame).all()
    accel = engine.renderer._accel
    builds = accel.blas_builds
    from steeljax.scene.builtin import _trs
    scene.entities[scene.renderable_entities()[-1]].local_transform = \
        _trs((1.0, -3.5, 2.0))
    scene.materials[0].roughness_factor = 0.5  # material edit refreshes too
    scene.revision += 1
    frame = engine.tick(1 / 30)
    assert accel.blas_builds == builds, "transform edit rebuilt a BLAS"
    assert np.isfinite(frame).all()
    assert float(engine.renderer.path_tracer.flat.mat_params[0, 0]) == 0.5
    engine.inject_key("t")  # hybrid over the same instanced tables
    frame = engine.tick(1 / 30)
    assert np.isfinite(frame).all()


def test_engine_mode_toggle_key(tiny_env):
    scene = make_cornell_scene(sphere_detail=4)
    engine = Engine(scene, 16, 9, RenderConfig(width=16, height=9),
                    environment=tiny_env)
    from steeljax.render.scene_renderer import RenderMode
    assert engine.renderer.mode is RenderMode.PATH_TRACING
    engine.inject_key("t")
    assert engine.renderer.mode is RenderMode.HYBRID


def test_camera_update_resets_accumulation(tiny_env):
    scene = make_cornell_scene(sphere_detail=4)
    engine = Engine(scene, 16, 9, RenderConfig(width=16, height=9),
                    environment=tiny_env)
    engine.add_system(CameraSystem(engine.bus))
    engine.tick(1 / 30)
    assert int(engine.renderer.path_tracer.state.index) == 1
    engine.inject_key("w")
    engine.tick(1 / 30)  # camera moved -> accumulation restarted
    assert int(engine.renderer.path_tracer.state.index) == 1


def test_engine_resize_and_minimize(tiny_env):
    """eResize semantics (Engine.cpp:135-149): new extent propagates to
    both renderers + accumulation restarts; a zero extent suspends
    drawing until a real resize arrives."""
    scene = make_cornell_scene(sphere_detail=4)
    engine = Engine(scene, 16, 9, RenderConfig(width=16, height=9),
                    environment=tiny_env)
    engine.tick(1 / 30)
    engine.tick(1 / 30)
    assert int(engine.renderer.path_tracer.state.index) == 2

    engine.inject_resize(0, 0)          # minimize
    assert engine.draw_suspended
    idx_before = engine.frame_index
    frame = engine.tick(1 / 30)         # systems tick, no draw
    assert engine.frame_index == idx_before
    assert frame.shape == (9, 16, 3)    # last presented frame

    engine.inject_resize(24, 12)
    assert not engine.draw_suspended
    frame = engine.tick(1 / 30)
    assert frame.shape == (12, 24, 3)
    assert int(engine.renderer.path_tracer.state.index) == 1  # reset
    # Camera aspect followed the new extent.
    proj = scene.camera_projection
    assert abs(proj.width / proj.height - 2.0) < 1e-5


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from steeljax.io import checkpoint
    from steeljax.render.pt.renderer import AccumulationState
    state = AccumulationState(
        accumulated=jnp.ones((4, 4, 3)) * 0.5,
        index=jnp.asarray(7, jnp.int32))
    path = tmp_path / "accum.npz"
    checkpoint.save_accumulation(path, state)
    loaded = checkpoint.load_accumulation(path)
    np.testing.assert_allclose(np.asarray(loaded.accumulated), 0.5)
    assert int(loaded.index) == 7


def test_typed_input_enums_normalize():
    """InputHelpers.hpp enum surface (Key/KeyAction/MouseButton/Modifier
    flags) interoperates with the string-keyed event handlers."""
    from steeljax.engine.input import (Key, KeyAction, ModifierFlags,
                                       MouseButton, MouseButtonAction)

    assert Key.W == 87 and Key.ESCAPE == 256 and Key.MENU == 348
    assert Key.from_char("w") is Key.W
    assert Key.W.char == "w"
    assert Key.F5.char is None
    assert Key.from_char("~") is Key.UNKNOWN

    e = KeyInput(Key.W, KeyAction.PRESS, ModifierFlags.SHIFT)
    assert e == KeyInput("w", "press", ModifierFlags.SHIFT)
    assert KeyInput(Key.ESCAPE).key == "escape"

    m = MouseInput(MouseButton.LEFT, MouseButtonAction.RELEASE)
    assert m.button == "left" and m.action == "release"
    flags = ModifierFlags.SHIFT | ModifierFlags.CONTROL
    assert ModifierFlags.SHIFT in flags and ModifierFlags.ALT not in flags


def test_overlay_text_bindings(tiny_env):
    """UIRenderer analog: default frame-time binding + BindText-style
    registration (UIRenderer.cpp:106-125)."""
    from steeljax.core.config import RenderConfig
    from steeljax.engine.engine import Engine
    from steeljax.scene.builtin import make_cornell_scene

    engine = Engine(make_cornell_scene(sphere_detail=4), width=16,
                    height=9, config=RenderConfig(width=16, height=9),
                    environment=tiny_env)
    engine.add_text_binding(lambda: f"frame {engine.frame_index}")
    engine.tick(1 / 30)
    lines = engine.overlay_lines()
    assert len(lines) == 2
    assert lines[0].startswith("Frame time: ") and "FPS" in lines[0]
    assert lines[1] == "frame 1"


def test_reload_pipelines_is_per_mode(tiny_env):
    """The R key drops only the ACTIVE mode's compiled frame function
    (per-pipeline reload, HybridRenderer.cpp:117-129) — the other mode's
    executables stay warm — and the next tick still renders."""
    from steeljax.render.hybrid import renderer as hybrid_mod
    from steeljax.render.pt import integrator

    scene = make_cornell_scene(sphere_detail=4)
    engine = Engine(scene, 16, 9, RenderConfig(width=16, height=9),
                    environment=tiny_env)
    engine.tick(1 / 30)                      # compile PT frame
    engine.inject_key("t")                   # -> hybrid
    engine.tick(1 / 30)                      # compile hybrid frame
    assert integrator.render_pixels._cache_size() > 0
    assert hybrid_mod.render_hybrid_pixels._cache_size() > 0

    engine.inject_key("r")                   # reload ACTIVE (hybrid)
    assert hybrid_mod.render_hybrid_pixels._cache_size() == 0
    assert integrator.render_pixels._cache_size() > 0  # PT stays warm
    frame = engine.tick(1 / 30)              # recompiles + renders
    assert frame.shape == (9, 16, 3)
