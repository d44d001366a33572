"""Utility-layer tests: logger, AABBox, Transform, default textures,
probe visualization."""

import io
import os

import numpy as np
import pytest

from steeljax.core.aabb import AABBox
from steeljax.core.logger import ProgressLogger, log_i
from steeljax.scene.textures import (TextureCache, black_texture,
                                     checkered_texture, flat_normal_texture,
                                     white_texture)
from steeljax.scene.transform import Transform, matrix_to_quat, quat_to_matrix


def test_aabb_basics():
    box = AABBox.from_points([[0, 0, 0], [2, 4, 6]])
    np.testing.assert_allclose(box.center, [1, 2, 3])
    np.testing.assert_allclose(box.extent, [2, 4, 6])
    assert box.contains([1, 1, 1])
    assert not box.contains([3, 0, 0])
    assert box.extend(1.0).contains([-0.5, -0.5, -0.5])
    other = AABBox.from_points([[5, 5, 5], [6, 6, 6]])
    assert not box.intersects(other)
    assert box.add(other).intersects(other)
    assert box.corners().shape == (8, 3)


def test_aabb_transform():
    box = AABBox.from_points([[-1, -1, -1], [1, 1, 1]])
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = [10, 0, 0]
    moved = box.transform(m)
    np.testing.assert_allclose(moved.center, [10, 0, 0], atol=1e-6)


def test_transform_trs_roundtrip():
    q = np.array([0.0, 0.3826834, 0.0, 0.9238795], np.float32)  # 45deg yaw
    t = Transform.compose((1, 2, 3), q, (2, 2, 2))
    np.testing.assert_allclose(t.translation, [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(t.scale, [2, 2, 2], atol=1e-5)
    q_back = t.rotation
    # q and -q are the same rotation.
    if np.dot(q_back, q) < 0:
        q_back = -q_back
    np.testing.assert_allclose(q_back, q, atol=1e-5)


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(16):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r = quat_to_matrix(q.astype(np.float32))
        q2 = matrix_to_quat(r)
        if np.dot(q2, q) < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-4)


def test_transform_inverse_compose():
    t = Transform.compose((5, 0, 0), (0, 0, 0, 1), (2, 2, 2))
    identity = (t @ t.inverse()).matrix
    np.testing.assert_allclose(identity, np.eye(4), atol=1e-5)
    np.testing.assert_allclose(t.apply([1, 0, 0]), [7, 0, 0], atol=1e-6)


def test_default_textures():
    assert black_texture()[0, 0, 0] == 0
    assert white_texture()[0, 0, 0] == 255
    assert tuple(flat_normal_texture()[0, 0][:3]) == (128, 128, 255)
    chk = checkered_texture(8, 2)
    assert chk[0, 0, 0] != chk[0, 2, 0]


def test_texture_cache_dedup(tmp_path):
    from steeljax.io.image import write_png
    path = tmp_path / "t.png"
    write_png(path, np.zeros((2, 2, 3), np.uint8))
    cache = TextureCache()
    a = cache.get(path)
    b = cache.get(path)
    assert a is b
    assert len(cache) == 1


def test_progress_logger_throttles():
    stream = io.StringIO()
    p = ProgressLogger("bake", 100, min_interval=10.0, stream=stream)
    for i in range(50):
        p.update(i)
    p.finish()
    out = stream.getvalue()
    assert out.count("%") <= 3  # first emit + final
    assert "100%" in out


def test_probe_overlay():
    from steeljax.gi.debug import overlay_probes
    from steeljax.gi.light_volume import LightVolume
    import jax.numpy as jnp
    from steeljax.core import camera as camera_lib

    lv = LightVolume(
        positions=jnp.asarray([[0.0, 0.0, 0.0]]),
        tet_vertices=jnp.zeros((0, 4), jnp.int32),
        tet_neighbors=jnp.zeros((0, 4), jnp.int32),
        tet_matrices=jnp.zeros((0, 3, 3)),
        coefficients=jnp.ones((1, 9, 3)))
    frame = camera_lib.make_frame(camera_lib.DEFAULT_LOCATION,
                                  camera_lib.DEFAULT_PROJECTION)
    img = np.zeros((36, 64, 3), np.float32)
    out = overlay_probes(img, lv, frame.view_proj)
    assert out.max() > 0.0  # the probe at the origin is in view


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="heavy render (RUN_SLOW=1 to enable)")
def test_render_cli_profile_writes_trace(tmp_path):
    """--profile captures a jax.profiler trace of the render (the
    easy_profiler-socket analog, SURVEY.md §5)."""
    from steeljax.apps.render_cli import main

    out = tmp_path / "r.png"
    trace_dir = tmp_path / "trace"
    rc = main(["builtin:cornell", "-o", str(out), "--size", "16x9",
               "--spp", "1", "--cpu", "--profile", str(trace_dir)])
    assert rc == 0 and out.exists()
    traces = list(trace_dir.rglob("*.pb")) + list(
        trace_dir.rglob("*.trace.json.gz")) + list(
        trace_dir.rglob("*.xplane.pb"))
    assert traces, f"no trace files under {trace_dir}"


def test_render_cli_checkpoint_resume(tmp_path):
    """--checkpoint: a second CLI run resumes the accumulation index
    instead of starting over (the persistence the reference lacks)."""
    import numpy as np

    from steeljax.apps.render_cli import main

    ck = tmp_path / "accum.npz"
    out = tmp_path / "r.png"
    args = ["builtin:cornell", "-o", str(out), "--size", "16x9",
            "--spp", "2", "--cpu", "--checkpoint", str(ck)]
    assert main(args) == 0
    first = np.load(ck)["index"]
    assert int(first) == 2
    assert main(args) == 0
    assert int(np.load(ck)["index"]) == 4


def test_render_cli_checkpoint_size_mismatch_starts_fresh(tmp_path):
    """A checkpoint saved at another resolution is ignored with a warning
    (the resize-resets-accumulation semantics), not a shape crash."""
    import numpy as np

    from steeljax.apps.render_cli import main

    ck = tmp_path / "accum.npz"
    out = tmp_path / "r.png"
    base = ["builtin:cornell", "-o", str(out), "--spp", "1", "--cpu",
            "--checkpoint", str(ck)]
    assert main(base + ["--size", "16x9"]) == 0
    assert main(base + ["--size", "16x12"]) == 0  # mismatched resume
    assert int(np.load(ck)["index"]) == 1  # fresh accumulation, re-saved
    assert np.load(ck)["accumulated"].shape == (12, 16, 3)


def test_treelet_env_gate_requires_exactly_one(monkeypatch):
    """STEELJAX_TREELETS=0 must NOT enable the treelet path."""
    import numpy as np

    from steeljax.accel.dispatch import prepare_tables

    rng = np.random.default_rng(0)
    tri = rng.normal(size=(64, 3, 3)).astype(np.float32)
    ds = np.zeros(64, bool)
    monkeypatch.setenv("STEELJAX_TREELETS", "0")
    tables, _, _ = prepare_tables(tri, ds, use_pallas=True)
    assert tables.treelets is None
    monkeypatch.setenv("STEELJAX_TREELETS", "1")
    tables, _, _ = prepare_tables(tri, ds, use_pallas=True)
    assert tables.treelets is not None
