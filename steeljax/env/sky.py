"""Procedural HDR sky: the default environment when no panorama asset is
available.

The reference always binds an environment cubemap (Config::kUseDefaultAssets
loads SunnyHills.hdr, Config.hpp:21-23); that asset isn't shipped with the
repo snapshot, so steeljax substitutes an analytic clear-sky model (horizon
gradient + sun disk + ground) with comparable dynamic range.  Scenes with an
`environment` extras entry still load their .hdr panorama when present.

Because the model is closed-form, render paths that sample the *raw*
environment (path-tracer miss shading, forward-stage background) can
evaluate `sky_radiance` per ray instead of gathering the baked cubemap —
a TPU gather costs ~10 ms per M indices regardless of table size, while
the ~20 elementwise ops here fuse into the frame for free.  The baked
cube remains the source for the IBL convolutions (irradiance /
prefiltered reflection), which need a discretized map.
"""

from __future__ import annotations

import numpy as np

from steeljax.env.cubemap import face_directions

_SUN_DIRECTION = (0.35, 0.65, 0.25)
_SUN_RADIANCE = 80.0
_SUN_COS_RADIUS = 0.9995
_ZENITH_COLOR = (0.20, 0.45, 1.05)
_HORIZON_COLOR = (0.85, 0.92, 1.05)
_GROUND_COLOR = (0.35, 0.30, 0.25)
_SKY_SCALE = 1.2
_SUN_COLOR = (1.0, 0.95, 0.85)


def _sky_radiance(xp, dirs):
    """Shared closed-form sky model over a numpy-like module `xp`.

    dirs: (..., 3) unit directions -> (..., 3) linear radiance."""
    y = dirs[..., 1]
    sun = np.asarray(_SUN_DIRECTION, np.float32)
    sun = sun / np.linalg.norm(sun)

    t = xp.clip(y, 0.0, 1.0) ** 0.45
    sky = ((1.0 - t[..., None]) * xp.asarray(_HORIZON_COLOR, np.float32)
           + t[..., None] * xp.asarray(_ZENITH_COLOR, np.float32)) \
        * _SKY_SCALE

    below = xp.clip(-y, 0.0, 1.0) ** 0.5
    ground = xp.asarray(_GROUND_COLOR, np.float32)
    color = sky * (1.0 - below[..., None]) + ground * below[..., None]

    cos_sun = (dirs[..., 0] * sun[0] + dirs[..., 1] * sun[1]
               + dirs[..., 2] * sun[2])
    disk = (cos_sun > _SUN_COS_RADIUS).astype(np.float32)
    halo = xp.clip((cos_sun - 0.995) / 0.005, 0.0, 1.0) ** 8
    return color + (disk * _SUN_RADIANCE + halo * 2.0)[..., None] \
        * xp.asarray(_SUN_COLOR, np.float32)


def sky_radiance(dirs):
    """Analytic sky radiance at unit directions (..., 3) -> (..., 3),
    traceable (jnp).  Exactly the function `procedural_sky_cube` bakes;
    evaluating it directly skips the cubemap gather AND its bilinear /
    resolution discretization."""
    import jax.numpy as jnp
    return _sky_radiance(jnp, dirs)


def procedural_sky_cube(resolution: int = 256) -> np.ndarray:
    """(6, R, R, 3) float32 linear-radiance cubemap of `sky_radiance`."""
    dirs = face_directions(resolution)
    return _sky_radiance(np, dirs).astype(np.float32)
