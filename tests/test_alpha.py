"""Alpha-test (any-hit) semantics end-to-end: rays pass through cut-out
texels of ALPHA_TEST materials and stop on opaque ones
(AnyHit.rahit:35-52, bounded re-trace in trace_material_ray)."""

import numpy as np
import jax.numpy as jnp

from steeljax.core.config import RenderConfig
from steeljax.render.pt.integrator import trace_material_ray, trace_visibility
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_quad
from steeljax.scene.material import Material, MaterialFlags
from steeljax.scene.scene import Entity, RenderObject, Scene


def _alpha_scene():
    """A half-transparent alpha-test quad at z=0 in front of an opaque
    quad at z=-2 (both 10x10, facing +Z)."""
    scene = Scene()
    # Texture: left half alpha=0 (cut out), right half alpha=255.
    tex = np.full((8, 8, 4), 255, np.uint8)
    tex[:, :4, 3] = 0
    scene.textures.append(tex)
    scene.materials.append(Material(
        base_color_texture=0,
        flags=MaterialFlags.ALPHA_TEST | MaterialFlags.DOUBLE_SIDED))
    scene.materials.append(Material(flags=MaterialFlags.DOUBLE_SIDED))
    scene.primitives.append(make_quad(10.0))

    front = Entity(name="front", render_objects=[RenderObject(0, 0)])
    scene.add_entity(front)
    back = Entity(name="back", render_objects=[RenderObject(0, 1)])
    back.local_transform[:3, 3] = [0, 0, -2.0]
    scene.add_entity(back)
    return scene


def test_alpha_test_pass_through_and_block():
    scene = _alpha_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    assert flat.any_alpha_test

    # Quad uvs: u=0 at x=-5 -> left half (x<0) is transparent.
    o = jnp.asarray([[-2.5, 0.0, 5.0],   # through the cut-out
                     [+2.5, 0.0, 5.0]])  # into the opaque half
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    rec = trace_material_ray(flat, tables, o, d,
                             jnp.full(2, 0.001), jnp.full(2, 100.0),
                             cull_backface=False, max_alpha_retrace=4)
    t = np.asarray(rec["t"])
    assert bool(np.asarray(rec["hit"]).all())
    # Transparent texel: the hit is the BACK quad (t = 7); opaque texel:
    # the front quad (t = 5).
    assert abs(t[0] - 7.0) < 1e-3, t
    assert abs(t[1] - 5.0) < 1e-3, t


def test_alpha_test_visibility_rays():
    scene = _alpha_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    o = jnp.asarray([[-2.5, 0.0, 5.0], [+2.5, 0.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2)
    # Limit the ray to just past the front quad: the cut-out ray must be
    # unoccluded, the opaque ray occluded (TraceVisibilityRay semantics).
    occluded = np.asarray(trace_visibility(
        flat, tables, o, d, 0.001, jnp.full(2, 6.0), max_alpha_retrace=4))
    assert not occluded[0]
    assert occluded[1]


def test_alpha_test_render_smoke():
    """Full integrator pass over the alpha scene stays finite."""
    from steeljax.core import camera as camera_lib
    from steeljax.render.pt.integrator import render_sample

    scene = _alpha_scene()
    flat, tables = prepare_scene(scene, env_resolution=8)
    frame = camera_lib.make_frame(scene.camera_location,
                                  scene.camera_projection)
    img = np.asarray(render_sample(
        flat, tables, jnp.asarray(frame.inverse_view),
        jnp.asarray(frame.inverse_proj), frame.camera_near,
        frame.camera_far, 16, 12, 0, 0, RenderConfig(width=16, height=12)))
    assert np.isfinite(img).all()


def test_alpha_retrace_compaction_preserves_results(monkeypatch):
    """The rejected-ray compaction (one payload sort before the retrace
    loop, restored by a slot sort) must be invisible: identical records
    in the original ray order."""
    from steeljax.render.pt import integrator

    scene = _alpha_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    rng = np.random.default_rng(4)
    n = 64 * 128  # meets the compaction batch floor
    o = np.zeros((n, 3), np.float32)
    o[:, 0] = rng.uniform(-4.5, 4.5, n)
    o[:, 1] = rng.uniform(-4.5, 4.5, n)
    o[:, 2] = 5.0
    d = np.tile(np.array([0, 0, -1], np.float32), (n, 1))
    args = (flat, tables, jnp.asarray(o), jnp.asarray(d),
            jnp.full(n, 0.001, jnp.float32), jnp.full(n, 100.0, jnp.float32))

    plain = trace_material_ray(*args, cull_backface=False,
                               max_alpha_retrace=4)
    monkeypatch.setattr(integrator, "REPACK_MIN_TRIS", 1)
    compact = trace_material_ray(*args, cull_backface=False,
                                 max_alpha_retrace=4)
    for k in plain:
        np.testing.assert_array_equal(np.asarray(plain[k]),
                                      np.asarray(compact[k]), err_msg=k)
