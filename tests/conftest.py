"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the driver contract.

Note: the environment may pre-register a TPU platform plugin that calls
``jax.config.update("jax_platforms", ...)`` at interpreter start, which
overrides the JAX_PLATFORMS env var — so we must force the platform via
``jax.config.update`` AFTER importing jax, not via the env var. XLA_FLAGS
must still be set before the CPU backend is (lazily) created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
