"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host-platform virtual devices
(``xla_force_host_platform_device_count=8``); the real-TPU path is
exercised separately by bench.py and the driver's compile checks.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
