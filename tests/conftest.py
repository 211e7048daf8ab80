"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run without TPU hardware; sharding tests use
xla_force_host_platform_device_count=8 per the multi-chip dry-run
contract (__graft_entry__.dryrun_multichip).
"""
import os

# Force CPU regardless of outer env (the driver environment pins
# JAX_PLATFORMS=axon for the real chip; unit tests must not ride the tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/liquid_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import liquid_tpu  # noqa: E402,F401  (enables x64, registers pytrees)
