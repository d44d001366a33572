"""Equirectangular panorama -> cubemap conversion.

Parity with Source/Shaders/Compute/PanoramaToCube.comp:1-41: per cube texel,
direction from the face basis tables, panorama texcoord
(atan(z, x), asin(y)) * (0.1591, 0.3183) + 0.5 with the Y flip the reference
applies, bilinear sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from steeljax.env.cubemap import face_directions


def _sample_panorama(panorama: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of an (H, W, 3) panorama with repeat wrap in u and
    clamp in v (linear-repeat sampler on a full-sphere image)."""
    h, w = panorama.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    c00 = panorama[y0i, x0i]
    c10 = panorama[y0i, x1i]
    c01 = panorama[y1i, x0i]
    c11 = panorama[y1i, x1i]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


@jax.jit
def panorama_to_cube_jit(panorama: jnp.ndarray,
                         dirs: jnp.ndarray) -> jnp.ndarray:
    d = dirs * jnp.asarray([1.0, -1.0, 1.0], jnp.float32)
    inverse_atan = jnp.asarray([0.1591, 0.3183], jnp.float32)
    uv = jnp.stack([jnp.arctan2(d[..., 2], d[..., 0]),
                    jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))],
                   axis=-1) * inverse_atan + 0.5
    return _sample_panorama(panorama, uv)


def panorama_to_cube(panorama: np.ndarray, resolution: int = 256
                     ) -> jnp.ndarray:
    """(H, W, 3) float32 equirect -> (6, R, R, 3) cubemap."""
    dirs = jnp.asarray(face_directions(resolution))
    return panorama_to_cube_jit(jnp.asarray(panorama, jnp.float32), dirs)
