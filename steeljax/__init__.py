"""steeljax — a TPU-native (JAX/XLA/Pallas) physically-based render engine.

A from-scratch rebuild of the capabilities of eqxBarboss/SteelEngine (a C++20
Vulkan 1.3 RTX engine) as an idiomatic TPU framework:

* Monte-Carlo path tracing with static-camera accumulation
  (reference: Source/Shaders/PathTracing/RayGen.rgen) re-expressed as a
  wavefront integrator over flat scene arrays and an LBVH.
* Hybrid rendering: G-buffer -> deferred PBR lighting with ray-traced hard
  shadows -> forward/environment composite
  (reference: Source/Engine/Render/Private/HybridRenderer.cpp:79-91).
* GLTF scene loading with KHR_lights_punctual, prefab/instance scene ops
  (reference: Source/Engine/Scene/Private/SceneLoader.cpp:371-608).
* HDR environment maps with preconvolved IBL (irradiance, prefiltered
  reflections, split-sum LUT) and a light-volume GI bake (probes -> SH9 ->
  tetrahedral interpolation).

Parallelism maps to pixel/tile sharding over a `jax.sharding.Mesh` instead of
a GPU command queue; hot kernels are Pallas; everything composes under `jit`.
"""

__version__ = "0.1.0"

import jax as _jax

# fp32 everywhere (CLAUDE.md convention; parity with the reference's GLSL):
# TPU MXU matmuls/einsums default to bf16 multiplies, which corrupts the
# tiny camera/instance-transform matvecs (~2.5e-3 relative error — exactly
# bf16 mantissa, measured via kernel-parity t-deltas on the instanced path).
# Force full fp32 for every dot/einsum in the engine.
_jax.config.update("jax_default_matmul_precision", "float32")
