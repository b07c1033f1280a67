"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host-platform virtual devices
(``xla_force_host_platform_device_count=8``); the real-TPU path is
exercised separately by bench.py and the driver's compile checks.
"""

import os

# Must be set before jax is imported anywhere.  Force-override: the outer
# environment pins JAX_PLATFORMS to the real TPU (axon), but tests run on
# the virtual CPU mesh (float64 + 8 virtual devices).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon plugin re-appends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is exported, so force the config after import too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: XLA:CPU compiles of the conv/gather programs
# take seconds each; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/gar_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
