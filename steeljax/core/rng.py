"""Counter-free xoroshiro64** RNG and Thomas Wang hash as uint32 array ops.

The reference seeds a per-pixel xoroshiro64** stream from the pixel id,
sample index, and accumulation index (Source/Shaders/Common/Random.glsl:9-56,
Source/Shaders/PathTracing/RayGen.rgen:37-50).  Bit-faithful replication in
fp32/uint32 is required for image parity with the converged Vulkan output, so
we implement the identical integer recurrence in jnp rather than using
JAX's threefry.

State is an explicit `(..., 2) uint32` array threaded functionally: every
draw returns `(value, new_state)`.  All ops vectorize over arbitrary leading
dims (one independent stream per pixel/ray).
"""

from __future__ import annotations

import jax.numpy as jnp

_GOLDEN = jnp.uint32(0x9E3779BB)
_FIVE = jnp.uint32(5)


def _rotl(x: jnp.ndarray, k: int) -> jnp.ndarray:
    k = jnp.uint32(k)
    return (x << k) | (x >> (jnp.uint32(32) - k))


def wang_hash(x: jnp.ndarray) -> jnp.ndarray:
    """Thomas Wang 32-bit integer hash (Random.glsl:49-57)."""
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> jnp.uint32(16))
    x = x + (x << jnp.uint32(3))
    x = x ^ (x >> jnp.uint32(4))
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> jnp.uint32(15))
    return x


def rand_uint32(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One xoroshiro64** step (Random.glsl:16-25).

    `state` is (..., 2) uint32; returns (result (...,), new_state (..., 2)).
    """
    s0 = state[..., 0]
    s1 = state[..., 1]
    result = _rotl(s0 * _GOLDEN, 5) * _FIVE
    s1 = s1 ^ s0
    s0 = _rotl(s0, 26) ^ s1 ^ (s1 << jnp.uint32(9))
    s1 = _rotl(s1, 13)
    return result, jnp.stack([s0, s1], axis=-1)


def next_float(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform float in [0, 1) via the mantissa trick (Random.glsl:27-31)."""
    bits, state = rand_uint32(state)
    u = jnp.uint32(0x3F800000) | (bits >> jnp.uint32(9))
    f = jnp.asarray(u).view(jnp.float32) - jnp.float32(1.0)
    return f, state


def next_vec2(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    a, state = next_float(state)
    b, state = next_float(state)
    return jnp.stack([a, b], axis=-1), state


def next_vec3(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    a, state = next_float(state)
    b, state = next_float(state)
    c, state = next_float(state)
    return jnp.stack([a, b, c], axis=-1), state


def make_seed(pixel_x: jnp.ndarray, pixel_y: jnp.ndarray,
              sample_index, accumulation_index) -> jnp.ndarray:
    """Per-pixel stream seed (RayGen.rgen:37-50).

    s0 hashes the pixel id, s1 hashes (sample, accumulation) indices; one
    warm-up step mixes the state exactly as the reference's `Rand(seed)` call.
    """
    px = pixel_x.astype(jnp.uint32)
    py = pixel_y.astype(jnp.uint32)
    s0 = (px << jnp.uint32(16)) | py
    sample_u = jnp.asarray(sample_index).astype(jnp.uint32)
    accum_u = jnp.asarray(accumulation_index).astype(jnp.uint32)
    s1 = jnp.broadcast_to((sample_u << jnp.uint32(8)) | accum_u, s0.shape)
    state = jnp.stack([wang_hash(s0), wang_hash(s1)], axis=-1)
    _, state = rand_uint32(state)
    return state
