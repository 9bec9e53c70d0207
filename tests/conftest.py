"""Test configuration.

Tests run on the CPU backend with 8 virtual devices (for the sharding group)
and x64 enabled for reference-parity numerics (the reference defaults to
Float64, reference: src/discretize.jl:430-447).

The host may inject a remote-TPU plugin via sitecustomize (jax is imported
before conftest runs), so JAX_PLATFORMS set via env is too late — instead we
flip `jax_platforms` through jax.config before any backend initializes.
Remote-TPU compiles are ~50x slower than host CPU compiles for these small
test programs.  Set NEURALPDE_TEST_PLATFORM=default to run on whatever
backend the environment provides.
"""

import os

import jax

if os.environ.get("NEURALPDE_TEST_PLATFORM", "cpu") == "cpu":
    # must precede any jax computation: platform choice + virtual devices
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)

# cache compiled programs across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
