"""Acceleration structures: LBVH build + traversal.

TPU-native replacement for the driver-built Vulkan acceleration structures
(Source/Engine/Render/Vulkan/Resources/AccelerationStructureManager.cpp).
"""

from steeljax.accel.bvh import BVH, build_bvh, apply_permutation  # noqa: F401
from steeljax.accel.traverse import (  # noqa: F401
    trace_nearest, trace_nearest_brute, trace_any)
