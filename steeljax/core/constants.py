"""Shared numeric constants.

Mirrors the reference's shader-side constant vocabulary
(Source/Shaders/Common/Constants.glsl, Common/RayTracing.glsl:10-11,
Common/Common.h:4-10) so that images match bit-for-bit where possible.
"""

import numpy as np

EPSILON = 1e-6
BIAS = 0.005

PI = 3.141592654  # the reference's truncated PI (Constants.glsl:14)
INVERSE_PI = 0.31830988618

RAY_MIN_T = 0.001
RAY_MAX_T = 1000.0
# t_max for lanes that must trace nothing (dead/masked rays).  Must be
# below ANY reachable slab entry distance: with -1.0 a ray whose origin
# sits inside a node extending >1 unit behind it has near <= -1 and
# still descends (measured: fully-dead packets paid ~870 node pops on
# the 1.6M-tri stress scene instead of 1).  -3e38 guarantees the root
# test rejects in one pop.
RAY_DEAD_T = -3.0e38

# Path-tracing budget (RayGen.rgen:18-26)
MIN_BOUNCE_COUNT = 2
MAX_BOUNCE_COUNT = 4
MIN_THRESHOLD = 0.05
MAX_IRRADIANCE = 8.0
DIRECT_LIGHT_DISK_RADIUS = 0.0047
POINT_LIGHT_RADIUS = 0.05

# Scene capacity limits (Common/Common.h:4-10). These are soft limits in
# steeljax (arrays size to the scene), kept for parity checks.
MAX_LIGHT_COUNT = 16
MAX_MATERIAL_COUNT = 256
MAX_TEXTURE_COUNT = 1024
MAX_PRIMITIVE_COUNT = 2048

SH_COEFFICIENT_COUNT = 9
TET_VERTEX_COUNT = 4

DIELECTRIC_F0 = 0.04

UNIT_X = np.array([1.0, 0.0, 0.0], np.float32)
UNIT_Y = np.array([0.0, 1.0, 0.0], np.float32)
UNIT_Z = np.array([0.0, 0.0, 1.0], np.float32)

CUBE_FACE_COUNT = 6

# Cube-face basis tables (Constants.glsl:24-48): +X -X +Y -Y +Z -Z.
CUBE_FACES_N = np.array(
    [UNIT_X, -UNIT_X, UNIT_Y, -UNIT_Y, UNIT_Z, -UNIT_Z], np.float32)
CUBE_FACES_T = np.array(
    [-UNIT_Z, UNIT_Z, UNIT_X, UNIT_X, UNIT_X, -UNIT_X], np.float32)
CUBE_FACES_B = np.array(
    [-UNIT_Y, -UNIT_Y, UNIT_Z, -UNIT_Z, -UNIT_Y, -UNIT_Y], np.float32)
