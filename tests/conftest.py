"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); this harness is the
fake-backend layer it never needed.  Multi-chip sharding paths run against
`--xla_force_host_platform_device_count=8` CPU devices so "distributed"
tests need no TPUs.

Note: the axon TPU plugin's sitecustomize forcibly sets
jax_platforms="axon,cpu" at import, so the env var alone is not enough —
we must update jax.config after importing jax.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")
# Validation layers on, like the reference's debug builds
# (VulkanConfig.hpp:17-21): every prepare_scene in the suite runs the
# structural invariant checks (core.validate).
os.environ.setdefault("STEELJAX_VALIDATE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
