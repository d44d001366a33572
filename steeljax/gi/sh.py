"""Spherical harmonics (SH-9) projection and irradiance evaluation.

Projection parity with LightVolume.comp: sphere Riemann sum with
SAMPLE_DELTA=0.05, coefficients = 2*PI * sum(basis * L * sin(theta)) /
count.  Evaluation parity with ComputeIrradiance (Common.glsl:180-194),
the Ramamoorthi-Hanrahan irradiance polynomial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from steeljax.core.constants import PI
from steeljax.env.cubemap import sample_cube

SAMPLE_DELTA = 0.05  # LightVolume.comp:10


def sh_basis(n: jnp.ndarray) -> jnp.ndarray:
    """The 9 basis values at directions n (..., 3) -> (..., 9)
    (ComputeSH, LightVolume.comp:31-58)."""
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    one = jnp.ones_like(x)
    return jnp.stack([
        0.282095 * one,
        0.488603 * y,
        0.488603 * z,
        0.488603 * x,
        1.092548 * x * y,
        1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], axis=-1)


def _sphere_grid(delta: float = SAMPLE_DELTA):
    phi = np.arange(0.0, 2.0 * np.pi, delta)
    theta = np.arange(0.0, np.pi, delta)
    pp, tt = np.meshgrid(phi, theta, indexing="ij")
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                     np.cos(tt)], axis=-1).reshape(-1, 3)
    norms = np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = dirs / np.maximum(norms, 1e-12)
    sin_t = np.sin(tt).reshape(-1)
    return dirs.astype(np.float32), sin_t.astype(np.float32)


@jax.jit
def _project_impl(cubes: jnp.ndarray, dirs: jnp.ndarray,
                  sin_t: jnp.ndarray) -> jnp.ndarray:
    basis = sh_basis(dirs)                       # (S, 9)
    weights = basis * sin_t[:, None]             # (S, 9)

    def per_probe(cube):
        radiance = sample_cube(cube, dirs)       # (S, 3)
        coeffs = jnp.einsum("sk,sc->kc", weights, radiance)
        return 2.0 * PI * coeffs / dirs.shape[0]

    return jax.vmap(per_probe)(cubes)            # (P, 9, 3)


def project_sh9(cubes: jnp.ndarray,
                delta: float = SAMPLE_DELTA) -> jnp.ndarray:
    """Project probe cubemaps (P, 6, R, R, 3) to SH-9 (P, 9, 3) RGB
    coefficients."""
    dirs, sin_t = _sphere_grid(delta)
    return _project_impl(cubes, jnp.asarray(dirs), jnp.asarray(sin_t))


def eval_irradiance(coeffs: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Ramamoorthi irradiance polynomial (Common.glsl:180-194).

    coeffs: (..., 9, 3); n: (..., 3) -> (..., 3)."""
    c1, c2, c3, c4, c5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708
    x = n[..., 0:1]
    y = n[..., 1:2]
    z = n[..., 2:3]
    c = coeffs
    return (c1 * c[..., 8, :] * (x * x - y * y)
            + c3 * c[..., 6, :] * z * z
            + c4 * c[..., 0, :]
            - c5 * c[..., 6, :]
            + 2.0 * c1 * (c[..., 4, :] * x * y + c[..., 7, :] * x * z
                          + c[..., 5, :] * y * z)
            + 2.0 * c2 * (c[..., 3, :] * x + c[..., 1, :] * y
                          + c[..., 2, :] * z))
