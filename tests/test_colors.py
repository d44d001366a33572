"""Color conversions and tone mapping (Common.glsl:90-140)."""

import numpy as np
import jax.numpy as jnp

from steeljax.core import colors


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(
        np.asarray(colors.to_linear(colors.to_srgb(x))), np.asarray(x),
        atol=1e-5)


def test_srgb_breakpoints():
    assert abs(float(colors.to_srgb(jnp.asarray(0.0)))) < 1e-7
    assert abs(float(colors.to_srgb(jnp.asarray(1.0))) - 1.0) < 1e-5
    # Linear segment below the threshold.
    assert abs(float(colors.to_srgb(jnp.asarray(0.001))) - 0.01292) < 1e-5


def test_luminance_weights():
    assert abs(float(colors.luminance(jnp.asarray([1.0, 0, 0]))) - 0.2126) < 1e-6
    assert abs(float(colors.luminance(jnp.asarray([1.0, 1, 1]))) - 1.0) < 1e-5


def test_tone_map_monotonic_and_bounded():
    x = jnp.linspace(0.0, 20.0, 256)[:, None] * jnp.ones((1, 3))
    y = np.asarray(colors.tone_map(x))
    assert (np.diff(y[:, 0]) >= -1e-6).all()
    assert y.min() >= 0.0
    assert y.max() <= 1.0
    assert float(colors.tone_map(jnp.asarray(0.0))) == 0.0


def test_tone_map_matches_hejl_constants():
    # Spot value computed from the Hejl-Burgess-Dawson polynomial
    # (Common.glsl:119-124).
    x = 0.5
    xa = max(0.0, x - 0.004)
    expected = (xa * (6.2 * xa + 0.5)) / (xa * (6.2 * xa + 1.7) + 0.06)
    assert abs(float(colors.tone_map(jnp.asarray(x))) - expected) < 1e-6
