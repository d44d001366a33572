"""Environment component: cubemap + IBL bakes bundle.

The EnvironmentComponent analog (Source/Engine/Scene/Components/
EnvironmentComponent.hpp:7-19 / Private/EnvironmentComponent.cpp:7-21):
LoadEnvironment = panorama -> cubemap -> irradiance + prefiltered
reflection + (shared) specular BRDF LUT.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np
from flax import struct

from steeljax.env import ibl
from steeljax.env.panorama import panorama_to_cube
from steeljax.env.sky import procedural_sky_cube
from steeljax.io import image as image_io


@struct.dataclass
class Environment:
    cube: jnp.ndarray                       # (6, R, R, 3) radiance
    irradiance: jnp.ndarray                 # (6, r, r, 3)
    reflection_mips: tuple                  # tuple of (6, m, m, 3)
    # Packed form of the reflection chain for fast runtime trilinear
    # (8 gathers) — see env.cubemap.pack_mips.
    reflection_data: jnp.ndarray            # (N, 16) quad rows
    reflection_offsets: jnp.ndarray         # (M,)
    reflection_sizes: jnp.ndarray           # (M,)
    specular_lut: jnp.ndarray               # (L, L, 2)
    # Bilinear-footprint quad packs (one row gather per lookup — per-texel
    # gathers cost ~10x on TPU; see env.cubemap.pack_cube_quads).
    cube_quads: jnp.ndarray                 # (6*R*R, 16)
    irradiance_quads: jnp.ndarray           # (6*r*r, 16)
    specular_lut_quads: jnp.ndarray         # (L*L, 8)
    # Cube was baked from the closed-form procedural sky: raw-environment
    # lookups (forward background) evaluate sky.sky_radiance per ray
    # instead of gathering cube_quads.  The IBL convolutions above still
    # come from the baked cube.
    analytic: bool = struct.field(pytree_node=False, default=False)
    # Gather-free fast paths (lighting uses them when present; None falls
    # back to the exact gather forms above):
    # - irradiance_sh: least-squares SH fit of the irradiance cube
    #   (env.ibl.fit_cube_sh) — one inline basis eval + tiny matmul
    #   replaces the quad-row gather.  None when the bake's content
    #   exceeds the fit's residual gate.
    # - reflection_tri_data: mip-pair packed rows (cubemap.pack_mips_tri,
    #   keyed by reflection_offsets/sizes) — trilinear in ONE row gather
    #   instead of two.  None above TRI_PACK_MAX_ROWS (the pack is 3x the
    #   quad bytes; big chains keep the two-gather path rather than pay
    #   the host->device upload).
    irradiance_sh: jnp.ndarray | None = None
    reflection_tri_data: jnp.ndarray | None = None


# 48-f32 tri-pack rows cost 3x the quad pack; cap the eager device upload
# (the axon tunnel moves ~1 MB/s) at ~10 MB = 50k rows (reflection
# resolution <= 64, which covers every bench/test budget).
TRI_PACK_MAX_ROWS = 50_000


def load_environment(panorama_path: str | None = None,
                     cube: np.ndarray | None = None,
                     cube_resolution: int = 256,
                     irradiance_resolution: int = 64,
                     reflection_resolution: int = 256,
                     lut_resolution: int = 256,
                     lut_samples: int = 4096,
                     reflection_samples: int = 2048,
                     irradiance_delta: float = 0.025,
                     analytic: bool = False) -> Environment:
    """Build the full environment bundle (EnvironmentComponent analog).

    Sources in priority order: explicit `cube`, a Radiance panorama at
    `panorama_path`, else the procedural sky.  Callers passing a cube
    they know was baked from the procedural sky set `analytic=True` to
    keep the closed-form background path."""
    if cube is None:
        if panorama_path and Path(panorama_path).exists():
            panorama = image_io.load_hdr(panorama_path)
            cube = np.asarray(panorama_to_cube(panorama, cube_resolution))
        else:
            cube = procedural_sky_cube(cube_resolution)
            analytic = True
    cube = jnp.asarray(cube, jnp.float32)
    from steeljax.env.cubemap import (pack_cube_quads, pack_mips,
                                      pack_mips_tri)
    reflection_mips = ibl.generate_reflection_mips(
        cube, reflection_resolution, reflection_samples)
    data, offsets, sizes = pack_mips(reflection_mips)
    tri_rows = sum(6 * m.shape[1] * m.shape[1] for m in reflection_mips)
    tri_data = (pack_mips_tri(reflection_mips)[0]
                if tri_rows <= TRI_PACK_MAX_ROWS else None)
    irradiance = ibl.generate_irradiance_cube(
        cube, irradiance_resolution, irradiance_delta)
    irradiance_sh, _ = ibl.fit_cube_sh(irradiance)
    lut = ibl.specular_brdf_lut(lut_resolution, lut_samples)
    return Environment(
        cube=cube,
        irradiance=irradiance,
        reflection_mips=reflection_mips,
        reflection_data=data,
        reflection_offsets=offsets,
        reflection_sizes=sizes,
        specular_lut=lut,
        cube_quads=jnp.asarray(pack_cube_quads(np.asarray(cube))),
        irradiance_quads=jnp.asarray(
            pack_cube_quads(np.asarray(irradiance))),
        specular_lut_quads=ibl.pack_lut_quads(lut),
        analytic=analytic,
        irradiance_sh=irradiance_sh,
        reflection_tri_data=tri_data,
    )
