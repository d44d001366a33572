"""Multi-hit (K-nearest) alpha resolution — the CPU-checkable layer of
the TPU multi-hit kernel path (render.pt.integrator._resolve_multihit /
accel.pallas_traverse.trace_multihit_packet8).

The kernel itself cannot run on CPU (see pallas_traverse module note);
on-TPU slot parity vs a brute-force oracle is covered by
apps/kernel_parity.py.  Here we drive the winner-selection/exhaustion
logic with oracle-derived candidate slots on the same two-quad alpha
scene test_alpha.py uses, so the exact-test semantics (AnyHit.rahit:
35-52) are pinned on CPU.
"""

import numpy as np
import jax.numpy as jnp

from steeljax.accel.dispatch import trace_nearest
from steeljax.render.pt.integrator import _resolve_multihit
from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import make_quad
from steeljax.scene.material import Material, MaterialFlags
from steeljax.scene.scene import Entity, RenderObject, Scene


def _alpha_scene():
    """Alpha-test quad (left half cut out) at z=0 over an opaque quad at
    z=-2 (mirrors tests/test_alpha.py)."""
    scene = Scene()
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


def _hit_at(flat, tables, o, d, t_min, t_max):
    rec = trace_nearest(tables, flat.tri_pos, flat.tri_double_sided,
                        jnp.asarray(o), jnp.asarray(d),
                        jnp.asarray(t_min, jnp.float32),
                        jnp.asarray(t_max, jnp.float32),
                        cull_backface=False)
    return {k: np.asarray(v) for k, v in rec.items()}


def _slots_from(hits):
    """Stack per-slot hit dicts (lists over rays) into the (K, N) slot
    arrays trace_multihit_packet8 returns."""
    k = len(hits)
    return {f: jnp.asarray(np.stack([h[f] for h in hits]))
            for f in ("t", "u", "v", "tri")}


def test_resolve_multihit_picks_first_surviving_slot():
    scene = _alpha_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    # Ray A goes through the cut-out half (front rejected, back wins);
    # ray B hits the opaque half (front wins).
    o = np.array([[-2.5, 0, 5.0], [2.5, 0, 5.0]], np.float32)
    d = np.array([[0, 0, -1.0]] * 2, np.float32)
    front = _hit_at(flat, tables, o, d, np.full(2, 0.001),
                    np.full(2, 6.0))
    back = _hit_at(flat, tables, o, d, np.full(2, 6.0),
                   np.full(2, 100.0))
    assert front["hit"].all() and back["hit"].all()

    slots = _slots_from([front, back])
    rec, exhausted = _resolve_multihit(flat, tables, slots)
    rec = {k: np.asarray(v) for k, v in rec.items()}
    assert rec["hit"].all()
    assert not np.asarray(exhausted).any()
    assert abs(rec["t"][0] - 7.0) < 1e-3     # back quad wins through cutout
    assert abs(rec["t"][1] - 5.0) < 1e-3     # opaque front wins
    assert rec["tri"][0] == back["tri"][0]
    assert rec["tri"][1] == front["tri"][1]


def test_resolve_multihit_exhausted_and_miss():
    scene = _alpha_scene()
    flat, tables = prepare_scene(scene, env_resolution=8,
                                 use_default_environment=False)
    o = np.array([[-2.5, 0, 5.0], [-2.5, 0, 5.0]], np.float32)
    d = np.array([[0, 0, -1.0]] * 2, np.float32)
    front = _hit_at(flat, tables, o, d, np.full(2, 0.001),
                    np.full(2, 6.0))  # transparent-texel hits

    # Ray 0: both slots are the rejected front hit -> exhausted (more
    # surfaces might exist past slot K-1).  Ray 1: slot 0 empty -> a
    # resolved miss (no retrace).
    empty = {"t": np.full(2, -1.0, np.float32),
             "u": np.zeros(2, np.float32), "v": np.zeros(2, np.float32),
             "tri": np.full(2, -1, np.int32), "hit": np.zeros(2, bool)}
    slot0 = {f: np.where(np.array([True, False]), front[f], empty[f])
             for f in ("t", "u", "v", "tri")}
    slot1 = dict(slot0)
    slots = _slots_from([slot0, slot1])
    rec, exhausted = _resolve_multihit(flat, tables, slots)
    exhausted = np.asarray(exhausted)
    rec = {k: np.asarray(v) for k, v in rec.items()}
    assert exhausted[0] and not exhausted[1]
    assert not rec["hit"].any()


def test_multihit_kernel_slot_semantics_doc():
    """The kernel contract _resolve_multihit depends on: slots sorted
    ascending by t, -1 tri for absent hits, mask-rejected candidates
    absent.  Pinned here as a brute-force reference implementation the
    TPU parity gate (kernel_parity 'flat_multihit') compares against."""
    from steeljax.accel.alphamask import mask_test

    r = np.random.default_rng(9)
    t = np.where(r.uniform(size=(6, 4)) < 0.7,
                 r.uniform(1, 9, (6, 4)).astype(np.float32), -1.0)
    # Reference slot builder: sort positives ascending, pad with -1.
    for row in t:
        pos = np.sort(row[row > 0])
        want = np.concatenate([pos, np.full(len(row) - len(pos), -1.0)])
        got = np.concatenate([np.sort(row[row > 0]),
                              np.full((row <= 0).sum(), -1.0)])
        assert np.allclose(want, got)
    # mask_test is shared verbatim by kernel and oracle — spot-check the
    # fully-covered and fully-cut masks.
    assert bool(mask_test(jnp.int32((1 << 21) - 1), jnp.float32(0.3),
                          jnp.float32(0.3)))
    assert not bool(mask_test(jnp.int32(0), jnp.float32(0.3),
                              jnp.float32(0.3)))


def test_fine_multihit_oracle_opaque_bound_contract():
    """The fine two-plane multi-hit contract (kernel_parity
    'flat_multihit_fine' oracle): output = K nearest PASS-plane hits with
    t <= min t over OPAQUE-plane hits.  Hand-built quad stack: PASS-only
    at z=0, OPAQUE at z=-1, PASS-only at z=-2 — the z=-2 layer must be
    filtered by the opaque bound."""
    from steeljax.accel.alphamask import FINE_STRIDE, FINE_WORDS
    from steeljax.apps.kernel_parity import _multihit_oracle

    quads = []
    for z in (0.0, -1.0, -2.0):
        quads.append([[-5, -5, z], [5, -5, z], [5, 5, z]])
        quads.append([[-5, -5, z], [5, 5, z], [-5, 5, z]])
    tri_pos = np.asarray(quads, np.float32)
    ds = np.ones(6, bool)
    fine = np.zeros((6, FINE_STRIDE), np.int32)
    fine[:, :FINE_WORDS] = -1                    # PASS everywhere
    fine[2:4] = -1                               # z=-1 quad: OPAQUE too
    o = np.array([[0.3, -0.2, 5.0], [1.0, 2.0, 5.0]], np.float32)
    d = np.tile(np.array([0, 0, -1.0], np.float32), (2, 1))

    slots = _multihit_oracle(tri_pos, ds, o, d, 0.001, 100.0, 4,
                             False, None, fine=fine, use_opaque=True)
    t = slots["t"]
    assert np.allclose(t[0], 5.0, atol=1e-4)     # z=0 layer
    assert np.allclose(t[1], 6.0, atol=1e-4)     # z=-1 opaque layer
    assert (t[2] < 0).all() and (t[3] < 0).all()  # z=-2 filtered by ob

    # Control: no opaque bits -> all three layers appear.
    fine[2:4, FINE_WORDS:] = 0
    slots = _multihit_oracle(tri_pos, ds, o, d, 0.001, 100.0, 4,
                             False, None, fine=fine, use_opaque=True)
    assert np.allclose(slots["t"][2], 7.0, atol=1e-4)
    assert (slots["t"][3] < 0).all()

    # PASS-plane rejection: cut the z=0 layer entirely.
    fine[0:2, :FINE_WORDS] = 0
    slots = _multihit_oracle(tri_pos, ds, o, d, 0.001, 100.0, 4,
                             False, None, fine=fine, use_opaque=True)
    assert np.allclose(slots["t"][0], 6.0, atol=1e-4)


def test_prepare_tables_builds_fine_rows():
    """prepare_tables threads (T, FINE_STRIDE) fine masks into per-chunk
    packed int32 rows aligned with tris_packed (Pallas path only)."""
    from steeljax.accel.alphamask import FINE_STRIDE
    from steeljax.accel.bvh import TRI_PER_ROW
    from steeljax.accel.dispatch import prepare_tables

    r = np.random.default_rng(4)
    tris = r.uniform(-1, 1, (40, 3, 3)).astype(np.float32)
    ds = np.ones(40, bool)
    coarse = r.integers(0, 1 << 21, 40).astype(np.uint32)
    fine = r.integers(-(1 << 31), 1 << 31, (40, FINE_STRIDE),
                      dtype=np.int64).astype(np.int32)
    tables, order, padded = prepare_tables(
        tris, ds, leaf_size=12, use_pallas=True, tri_alpha_mask=coarse,
        tri_fine_mask=fine)
    chunk = tables.chunks[0]
    assert chunk.fine_mask_rows is not None
    rows = np.asarray(chunk.fine_mask_rows)
    assert rows.shape == (padded // TRI_PER_ROW, 128)
    # Row contents must be the PERMUTED fine masks in record order.
    for slot in range(padded):
        src = order[slot]
        want = fine[src] if src >= 0 else np.zeros(FINE_STRIDE, np.int32)
        r_, j = divmod(slot, TRI_PER_ROW)
        got = rows[r_, FINE_STRIDE * j:FINE_STRIDE * (j + 1)]
        assert (got == want).all(), slot
    # Without fine masks (or on the CPU path) the field stays None.
    t2, _, _ = prepare_tables(tris, ds, leaf_size=12, use_pallas=True,
                              tri_alpha_mask=coarse)
    assert t2.chunks[0].fine_mask_rows is None
    t3, _, _ = prepare_tables(tris, ds, leaf_size=12, use_pallas=False,
                              tri_alpha_mask=coarse, tri_fine_mask=fine)
    assert t3.chunks[0].fine_mask_rows is None
