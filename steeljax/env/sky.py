"""Procedural HDR sky: the default environment when no panorama asset is
available.

The reference always binds an environment cubemap (Config::kUseDefaultAssets
loads SunnyHills.hdr, Config.hpp:21-23); that asset isn't shipped with the
repo snapshot, so steeljax substitutes an analytic clear-sky model (horizon
gradient + sun disk + ground) with comparable dynamic range.  Scenes with an
`environment` extras entry still load their .hdr panorama when present.
"""

from __future__ import annotations

import numpy as np

from steeljax.env.cubemap import face_directions


def procedural_sky_cube(resolution: int = 256,
                        sun_direction=(0.35, 0.65, 0.25),
                        sun_radiance: float = 80.0,
                        sun_cos_radius: float = 0.9995,
                        zenith_color=(0.20, 0.45, 1.05),
                        horizon_color=(0.85, 0.92, 1.05),
                        ground_color=(0.35, 0.30, 0.25),
                        sky_scale: float = 1.2) -> np.ndarray:
    """(6, R, R, 3) float32 linear-radiance cubemap."""
    dirs = face_directions(resolution)
    y = dirs[..., 1]
    sun = np.asarray(sun_direction, np.float32)
    sun = sun / np.linalg.norm(sun)

    t = np.clip(y, 0.0, 1.0) ** 0.45
    sky = ((1.0 - t[..., None]) * np.asarray(horizon_color, np.float32)
           + t[..., None] * np.asarray(zenith_color, np.float32)) * sky_scale

    below = np.clip(-y, 0.0, 1.0) ** 0.5
    ground = np.asarray(ground_color, np.float32)
    color = sky * (1.0 - below[..., None]) + ground * below[..., None]

    cos_sun = np.einsum("...c,c->...", dirs, sun)
    disk = (cos_sun > sun_cos_radius).astype(np.float32)
    halo = np.clip((cos_sun - 0.995) / 0.005, 0.0, 1.0) ** 8
    color = color + (disk * sun_radiance + halo * 2.0)[..., None] * np.asarray(
        [1.0, 0.95, 0.85], np.float32)

    return color.astype(np.float32)
