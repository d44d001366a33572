"""Foliage alpha-test workload (scene.builtin.make_foliage_scene): the
San Miguel-class bench scene — textured leaf cards whose every hit runs
the alpha-test re-trace loop (reference AnyHit.rahit:25-52)."""

import numpy as np
import jax.numpy as jnp

from steeljax.render.pt.renderer import prepare_scene
from steeljax.scene.builtin import _leaf_texture, make_foliage_scene


def test_leaf_texture_coverage():
    tex = _leaf_texture()
    alpha = tex[..., 3] > 0
    # Partial coverage is the point: holes force the re-trace loop.
    assert 0.2 < alpha.mean() < 0.7
    assert tex.shape == (128, 128, 4) and tex.dtype == np.uint8


def test_foliage_scene_flattens_with_alpha_test():
    scene = make_foliage_scene(cards=200)
    flat, tables = prepare_scene(scene, env_resolution=8)
    # 200 cards x 2 tris + ground quad x 2 = 402 real triangles;
    # tri_pos is the BVH-permuted table with row-aligned leaf padding
    # (bvh._align_leaves), so the slot count is >= that and row-exact.
    from steeljax.accel.bvh import TRI_PER_ROW
    assert int(flat.triangle_count) >= 402
    assert int(flat.triangle_count) % TRI_PER_ROW == 0
    assert scene.primitives[0].triangle_count == 400
    assert flat.any_alpha_test
    assert flat.has_textures
    assert flat.light_count == 1


def test_foliage_alpha_retrace_passes_through_holes():
    """A ray through a leaf-texture hole must NOT register a hit; one
    through a lobe must.  Exercises trace_material_ray's alpha path."""
    from steeljax.render.pt.integrator import trace_material_ray

    scene = make_foliage_scene(cards=1, region=0.0, card_size=2.0)
    # Pin the single card: identity-ish orientation is random, so instead
    # aim rays along the card's own normal through known UV points.
    flat, tables = prepare_scene(scene, env_resolution=8)

    tex = _leaf_texture()
    alpha = tex[..., 3] > 0
    # UV (0.417, 0.575) sits deep inside a lobe (solid 9x9 neighborhood,
    # robust to bilinear filtering); (0.02, 0.02) is empty corner.
    u_hit, v_hit = 53 / 127, 73 / 127
    assert alpha[73, 53]
    assert not alpha[int(0.02 * 127), int(0.02 * 127)]

    # Reconstruct the card's world geometry from the flattened triangles
    # (tri 0-1 are the card, positions already world-space).
    v = np.asarray(flat.tri_pos[:2]).reshape(-1, 3)
    center = v.mean(axis=0)
    # The card plane normal from the first triangle.
    n = np.cross(v[1] - v[0], v[2] - v[0])
    n /= np.linalg.norm(n)

    # Card axes: corners at UV(0,1)=(-h,-h), UV(1,0)=(h,h) in card space.
    # tri0 = corners (0,1,2) = [(-h,-h),(h,-h),(h,h)] -> recover axes.
    ex = v[1] - v[0]  # +u direction * size
    ey = v[2] - v[1]  # -v direction * size

    def world_at_uv(u_, v_):
        return v[0] + ex * u_ + ey * (1.0 - v_)

    p_hit = world_at_uv(u_hit, v_hit)
    p_hole = world_at_uv(0.02, 0.02)
    o = jnp.asarray(np.stack([p_hit, p_hole]) + n * 3.0, jnp.float32)
    d = jnp.asarray(np.tile(-n, (2, 1)), jnp.float32)
    rec = trace_material_ray(flat, tables, o, d, 0.01, 10.0,
                             cull_backface=False, max_alpha_retrace=4)
    hit = np.asarray(rec["hit"])
    assert bool(hit[0]), "lobe texel should hit"
    assert not bool(hit[1]), "hole texel should pass through"
