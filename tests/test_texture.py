"""Texture pool bilinear sampling (linear-repeat sampler parity)."""

import numpy as np
import jax.numpy as jnp

from steeljax.render.texture import sample_bilinear


def _pool(*images):
    """Build a (mip-chained, quad-packed) texel pool like scene.flatten."""
    from steeljax.scene.flatten import (MAX_TEX_MIPS, _downsample2,
                                        _pack_texture_quads)
    offsets, sizes, chunks = [], [], []
    total = 0
    for img in images:
        h, w = img.shape[:2]
        sizes.append((w, h))
        mips = []
        level = img
        for m in range(MAX_TEX_MIPS):
            mips.append(total)
            chunks.append(_pack_texture_quads(level))
            total += level.shape[0] * level.shape[1]
            if level.shape[0] == 1 and level.shape[1] == 1:
                mips += [mips[-1]] * (MAX_TEX_MIPS - m - 1)
                break
            level = _downsample2(level)
        offsets.append(mips[:MAX_TEX_MIPS])
    return (jnp.asarray(np.concatenate(chunks)),
            jnp.asarray(np.array(offsets, np.int32)),
            jnp.asarray(np.array(sizes, np.int32)))


def test_texel_center_exact():
    img = (np.arange(4 * 4 * 4).reshape(4, 4, 4) % 256).astype(np.uint8)
    atlas, off, size = _pool(img)
    # uv at texel center (x+0.5)/w.
    uv = jnp.asarray([[(1 + 0.5) / 4, (2 + 0.5) / 4]], jnp.float32)
    got = np.asarray(sample_bilinear(atlas, off, size,
                                     jnp.asarray([0]), uv))[0]
    np.testing.assert_allclose(got, img[2, 1] / 255.0, atol=1e-6)


def test_bilinear_midpoint():
    img = np.zeros((1, 2, 4), np.uint8)
    img[0, 0] = 0
    img[0, 1] = 200
    atlas, off, size = _pool(img)
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)  # midway between the texels
    got = np.asarray(sample_bilinear(atlas, off, size,
                                     jnp.asarray([0]), uv))[0]
    np.testing.assert_allclose(got, 100 / 255.0, atol=1e-5)


def test_repeat_wrap():
    img = np.zeros((1, 4, 4), np.uint8)
    img[0, 0] = 40
    img[0, 3] = 200
    atlas, off, size = _pool(img)
    # u = 0 sits between texel 3 (left, wrapped) and texel 0.
    uv = jnp.asarray([[0.0, 0.5 / 1]], jnp.float32)
    got = np.asarray(sample_bilinear(atlas, off, size,
                                     jnp.asarray([0]), uv))[0, 0]
    expected = 0.5 * (40 + 200) / 255.0
    assert abs(got - expected) < 1e-5


def test_second_texture_offset():
    a = np.full((2, 2, 4), 10, np.uint8)
    b = np.full((2, 2, 4), 250, np.uint8)
    atlas, off, size = _pool(a, b)
    uv = jnp.asarray([[0.25, 0.25]], jnp.float32)
    got_a = np.asarray(sample_bilinear(atlas, off, size, jnp.asarray([0]), uv))
    got_b = np.asarray(sample_bilinear(atlas, off, size, jnp.asarray([1]), uv))
    np.testing.assert_allclose(got_a, 10 / 255.0, atol=1e-6)
    np.testing.assert_allclose(got_b, 250 / 255.0, atol=1e-6)


def test_trilinear_mip_blend():
    from steeljax.render.texture import sample_trilinear
    img = np.zeros((4, 4, 4), np.uint8)
    img[:, :2] = 0
    img[:, 2:] = 200
    atlas, off, size = _pool(img)
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
    tid = jnp.asarray([0])
    lod0 = np.asarray(sample_trilinear(atlas, off, size, tid, uv,
                                       jnp.asarray([0.0])))[0, 0]
    lod2 = np.asarray(sample_trilinear(atlas, off, size, tid, uv,
                                       jnp.asarray([2.0])))[0, 0]
    # Fully minified: the 1x1 mip is the average (100/255).
    assert abs(lod2 - 100 / 255) < 0.02
    mid = np.asarray(sample_trilinear(atlas, off, size, tid, uv,
                                      jnp.asarray([1.0])))[0, 0]
    assert 0.0 <= mid <= 1.0
