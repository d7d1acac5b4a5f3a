"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), per the driver contract. Must run
before jax initializes a backend, hence env vars at import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
