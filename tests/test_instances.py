"""Two-level acceleration structure (accel.instances) tests.

Oracle: the instanced trace must agree with the flattened world-space
trace (the single-level path) on the same scene; re-preparing after scene
edits must reuse every cached BLAS (the O(instances) contract of
AccelerationStructureManager.cpp:128-220 — BLAS built once per
primitive, only the instance tables rebuild)."""

import time

import numpy as np
import jax.numpy as jnp

from steeljax.accel.dispatch import prepare_tables, trace_nearest
from steeljax.accel.instances import InstancedAccel, trace_nearest_instanced
from steeljax.scene.builtin import _trs, make_cornell_scene
from steeljax.scene.flatten import flatten_scene
from steeljax.scene.scene import Entity, RenderObject


def _random_rays(n, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.normal(0, 6, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_instanced_matches_flattened():
    scene = make_cornell_scene(sphere_detail=6)
    flat = flatten_scene(scene)
    tables, order, padded = prepare_tables(
        np.asarray(flat.tri_pos), np.asarray(flat.tri_double_sided),
        leaf_size=16, use_pallas=False)
    tri_pos = np.full((padded, 3, 3), 3.0e37, np.float32)
    tri_ds = np.zeros(padded, bool)
    real = order >= 0
    tri_pos[np.nonzero(real)[0]] = np.asarray(flat.tri_pos)[order[real]]
    tri_ds[np.nonzero(real)[0]] = np.asarray(
        flat.tri_double_sided)[order[real]]

    accel = InstancedAccel(leaf_size=16, use_pallas=False)
    inst_tables = accel.prepare(scene)

    o, d = _random_rays(512)
    ref = trace_nearest(tables, jnp.asarray(tri_pos), jnp.asarray(tri_ds),
                        o, d, 0.001, 100.0, cull_backface=True)
    got = trace_nearest_instanced(inst_tables, o, d, 0.001, 100.0,
                                  cull_backface=True)

    hit_a = np.asarray(ref["hit"])
    hit_b = np.asarray(got["hit"])
    # World-space vs object-space intersection differs at fp edge cases;
    # allow a tiny mismatch fraction.
    assert (hit_a != hit_b).mean() < 0.01, "hit masks diverged"
    both = hit_a & hit_b
    assert both.sum() > 100  # the scene is actually being hit
    dt = np.abs(np.asarray(ref["t"])[both] - np.asarray(got["t"])[both])
    assert np.quantile(dt, 0.99) < 1e-3, f"t mismatch: p99={dt.max()}"
    assert np.asarray(got["inst"])[both].min() >= 0


def test_instanced_any_hit_masks():
    scene = make_cornell_scene(sphere_detail=4)
    accel = InstancedAccel(leaf_size=16, use_pallas=False)
    tables = accel.prepare(scene)
    o, d = _random_rays(128, seed=5)
    near = trace_nearest_instanced(tables, o, d, 0.001, 100.0)
    # Any ray with a nearest hit is occluded and vice versa.
    assert np.array_equal(np.asarray(near["hit"]),
                          np.asarray(near["t"]) > 0)


def test_instanced_render_matches_flattened():
    """End-to-end: the PT renderer over the two-level structure produces
    the same image as the flattened path (same seeds, same transport —
    only the acceleration structure and shading-row assembly differ)."""
    from steeljax.core.config import RenderConfig
    from steeljax.render.pt.renderer import PathTracingRenderer, prepare_scene

    w, h = 48, 27
    scene = make_cornell_scene(sphere_detail=4)
    config = RenderConfig(width=w, height=h)
    flat_img = PathTracingRenderer(
        scene, w, h, config,
        prepared=prepare_scene(scene, env_resolution=16)).render(4)
    inst_r = PathTracingRenderer(scene, w, h, config, instancing=True)
    inst_img = inst_r.render(4)
    rmse = float(np.sqrt(np.mean((np.asarray(flat_img)
                                  - np.asarray(inst_img)) ** 2)))
    assert rmse < 0.02, f"instanced render diverged: RMSE {rmse:.4f}"

    # Scene edit -> refresh_scene re-prepares without BLAS rebuilds.
    builds = inst_r._accel.blas_builds
    scene.entities[scene.renderable_entities()[-1]].local_transform = \
        _trs((1.0, -3.0, 2.0))
    scene.revision += 1
    inst_r.refresh_scene()
    assert inst_r._accel.blas_builds == builds
    img2 = inst_r.render(2)
    assert np.isfinite(np.asarray(img2)).all()


def test_instanced_hybrid_renders():
    """The hybrid pipeline runs end-to-end over instanced tables (the
    dispatch layer routes trace_nearest/trace_any to the two-level
    structure) and matches the flattened hybrid frame."""
    from steeljax.core.config import RenderConfig
    from steeljax.render.hybrid.renderer import HybridRenderer
    from steeljax.render.pt.renderer import prepare_scene
    from steeljax.scene.builtin import make_parity_scene

    w, h = 64, 36
    scene = make_parity_scene(sphere_detail=4)
    config = RenderConfig(width=w, height=h)
    # One tiny shared IBL bake: the default reference-budget bake costs
    # minutes on the CI CPU and the comparison only needs both renderers
    # to see the SAME environment.
    from steeljax.env.environment import load_environment
    from steeljax.env.sky import procedural_sky_cube
    env = load_environment(
        cube=procedural_sky_cube(16), irradiance_resolution=4,
        reflection_resolution=8, lut_resolution=16, lut_samples=32,
        reflection_samples=16, irradiance_delta=0.4)
    flat_img = HybridRenderer(
        scene, w, h, config, environment=env,
        prepared=prepare_scene(scene, env_resolution=16)).render_frame()
    inst_img = HybridRenderer(
        scene, w, h, config, environment=env,
        prepared=prepare_scene(scene, env_resolution=16,
                               accel=InstancedAccel(
                                   use_pallas=False))).render_frame()
    rmse = float(np.sqrt(np.mean((flat_img - inst_img) ** 2)))
    assert rmse < 0.02, f"instanced hybrid diverged: RMSE {rmse:.4f}"


def test_fused_table_layout():
    """Fused-shading tables (TPU mode, packed on host): row counts and the
    inst_trace layout contract of pallas_traverse._INST_COLS."""
    scene = make_cornell_scene(sphere_detail=6)
    accel = InstancedAccel(leaf_size=16, use_pallas=True)
    tables = accel.prepare(scene)
    assert tables.shade_mode == 1  # untextured scene -> normals + mat id
    assert tables.shade_rows is not None
    assert tables.shade_rows.shape[0] == tables.tris_packed.shape[0]
    assert tables.shade_rows.shape[1] == 128
    inst = np.asarray(tables.inst_trace)
    assert inst.shape[1] == 48
    assert int(tables.n_tlas) >= 1
    # BLAS roots sit past the TLAS prefix.
    assert (inst[:, 12] >= int(tables.n_tlas)).all()
    assert (inst[:, 12] < tables.snode_rows.shape[0]).all()
    # Material ids and normal matrices round-trip.
    mats = inst[:, 14].astype(int)
    assert mats.min() >= 0 and mats.max() < len(scene.materials)
    assert np.isfinite(inst[:, 16:34]).all()
    # The lamp instance has a nonuniform scale, so at least one normal
    # matrix must differ from its plain linear part.
    assert np.abs(inst[:, 16:25] - inst[:, 25:34]).max() > 1e-3


def test_reprepare_reuses_blas_and_is_instance_cost():
    scene = make_cornell_scene(sphere_detail=6)
    accel = InstancedAccel(leaf_size=16, use_pallas=False)
    t0 = accel.prepare(scene)
    builds_initial = accel.blas_builds
    assert builds_initial == 3  # quad, box, sphere

    # Transform edit (the TestSystem-style per-frame case).
    scene.entities[scene.renderable_entities()[0]].local_transform = \
        _trs((0.5, 0.0, 0.0))
    t1 = accel.prepare(scene)
    assert accel.blas_builds == builds_initial, "transform edit rebuilt BLAS"
    # The heavy device tables are the SAME arrays — zero re-upload.
    assert t1.tris_packed is t0.tris_packed
    assert np.asarray(t1.inst_trace).shape == np.asarray(t0.inst_trace).shape

    # Adding an instance of a KNOWN primitive: still no BLAS build.
    scene.add_entity(Entity(
        name="extra", local_transform=_trs((1.0, 2.0, 0.0)),
        render_objects=[RenderObject(2, 4)]))
    t2 = accel.prepare(scene)
    assert accel.blas_builds == builds_initial
    assert t2.instance_count == t1.instance_count + 1
    assert t2.tris_packed is t0.tris_packed

    # Re-prepare is instance-cost: time it against a fresh full build.
    reps = 3
    start = time.perf_counter()
    for _ in range(reps):
        accel.prepare(scene)
    reprep = (time.perf_counter() - start) / reps
    start = time.perf_counter()
    InstancedAccel(leaf_size=16, use_pallas=False).prepare(scene)
    full = time.perf_counter() - start
    assert reprep < full, (
        f"re-prepare ({reprep:.4f}s) not cheaper than full ({full:.4f}s)")
