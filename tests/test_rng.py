"""Bit-exactness of the xoroshiro64** / Wang-hash RNG against a pure-Python
integer model of Source/Shaders/Common/Random.glsl."""

import numpy as np
import jax.numpy as jnp

from steeljax.core import rng

M32 = 0xFFFFFFFF


def py_rotl(x, k):
    return ((x << k) | (x >> (32 - k))) & M32


def py_rand(s0, s1):
    result = (py_rotl((s0 * 0x9E3779BB) & M32, 5) * 5) & M32
    s1 ^= s0
    s0 = py_rotl(s0, 26) ^ s1 ^ ((s1 << 9) & M32)
    s1 = py_rotl(s1, 13)
    return result, s0, s1


def py_wang(x):
    x = ((x ^ 61) ^ (x >> 16)) & M32
    x = (x + ((x << 3) & M32)) & M32
    x = x ^ (x >> 4)
    x = (x * 0x27D4EB2D) & M32
    x = x ^ (x >> 15)
    return x


def test_wang_hash_matches():
    values = np.array([0, 1, 2, 61, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(rng.wang_hash(jnp.asarray(values)))
    expected = np.array([py_wang(int(v)) for v in values], np.uint32)
    np.testing.assert_array_equal(got, expected)


def test_xoroshiro_sequence_matches():
    s0, s1 = 0x12345678, 0x9ABCDEF0
    state = jnp.asarray(np.array([[s0, s1]], np.uint32))
    for _ in range(16):
        got, state = rng.rand_uint32(state)
        expected, s0, s1 = py_rand(s0, s1)
        assert int(got[0]) == expected
        assert int(state[0, 0]) == s0
        assert int(state[0, 1]) == s1


def test_next_float_mantissa_trick():
    s0, s1 = 7, 11
    state = jnp.asarray(np.array([[s0, s1]], np.uint32))
    f, _ = rng.next_float(state)
    bits, _, _ = py_rand(s0, s1)
    expected = np.uint32(0x3F800000 | (bits >> 9)).view(np.float32) - 1.0
    assert float(f[0]) == np.float32(expected)


def test_next_float_in_unit_interval():
    state = rng.make_seed(jnp.arange(512, dtype=jnp.uint32),
                          jnp.arange(512, dtype=jnp.uint32), 0, 0)
    for _ in range(8):
        f, state = rng.next_float(state)
        assert float(jnp.min(f)) >= 0.0
        assert float(jnp.max(f)) < 1.0


def test_seed_matches_reference_scheme():
    """GetSeed (RayGen.rgen:37-50): hash pixel/sample words then one
    warm-up step."""
    x, y, sample, accum = 3, 5, 2, 9
    state = rng.make_seed(jnp.asarray([x], jnp.uint32),
                          jnp.asarray([y], jnp.uint32), sample, accum)
    s0 = py_wang(((x << 16) | y) & M32)
    s1 = py_wang(((sample << 8) | accum) & M32)
    _, s0, s1 = py_rand(s0, s1)
    assert int(state[0, 0]) == s0
    assert int(state[0, 1]) == s1


def test_streams_decorrelated():
    state = rng.make_seed(jnp.arange(4096, dtype=jnp.uint32) % 64,
                          jnp.arange(4096, dtype=jnp.uint32) // 64, 0, 0)
    f, _ = rng.next_float(state)
    f = np.asarray(f)
    assert 0.45 < f.mean() < 0.55
    assert len(np.unique(f)) > 4000
