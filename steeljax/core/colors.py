"""Color-space conversions, luminance, tone mapping.

Matches Source/Shaders/Common/Common.glsl:90-140 so that the fp32 image
output is comparable against the reference renderer per-pixel.
"""

from __future__ import annotations

import jax.numpy as jnp

_LUMA = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)


def to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    higher = 1.055 * jnp.power(jnp.maximum(linear, 0.0), 1.0 / 2.4) - 0.055
    lower = linear * 12.92
    return jnp.where(linear < 0.0031308, lower, higher)


def to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    higher = jnp.power(jnp.maximum(srgb + 0.055, 0.0) / 1.055, 2.4)
    lower = srgb / 12.92
    return jnp.where(srgb < 0.04045, lower, higher)


def luminance(color: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...c,c->...", color, _LUMA)


def tone_map(linear: jnp.ndarray) -> jnp.ndarray:
    """Filmic (Hejl-Burgess-Dawson) tone map; output is sRGB-encoded
    (Common.glsl:119-124)."""
    x = jnp.maximum(0.0, linear - 0.004)
    return (x * (6.2 * x + 0.5)) / (x * (6.2 * x + 1.7) + 0.06)


def uncharted_tone_map(linear: jnp.ndarray) -> jnp.ndarray:
    """Uncharted-2 filmic curve (Common.glsl:126-138); output is linear and
    still needs sRGB encoding."""
    a, b, c, d, e, f, wp = 0.22, 0.30, 0.10, 0.20, 0.01, 0.30, 11.2

    def curve(x):
        return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f

    return curve(linear) / curve(jnp.float32(wp))
