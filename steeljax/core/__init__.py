"""Core utilities: constants, RNG, color math, camera, config.

The TPU-native replacement for the reference's L1/L2 layers (Utils + the
parts of the Vulkan RHI that survive XLA owning memory and scheduling).
"""

from steeljax.core import constants, rng, colors, camera, config  # noqa: F401
