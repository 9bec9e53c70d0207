"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and enable x64 for reference-parity numerics (the
reference defaults to Float64, reference: src/discretize.jl:430-447)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Single-core host: XLA compiles dominate test time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
