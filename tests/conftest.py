"""Test configuration: force CPU with an 8-device virtual mesh.

The outer environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
sitecustomize imports jax at interpreter start, so env vars are too late
-- the platform must be switched via jax.config.update, which works any
time before first backend use.  Sharding tests rely on
xla_force_host_platform_device_count=8 (same contract as
__graft_entry__.dryrun_multichip).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/liquid_tpu_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import liquid_tpu  # noqa: E402,F401  (enables x64, registers pytrees)
