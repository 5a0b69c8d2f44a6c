"""Test harness: simulate an 8-device TPU mesh on CPU.

Must set the XLA flags before jax initializes its backends (SURVEY.md §4:
the reference has no multi-node test story; we substitute a virtual mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset e.g. "axon"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite compiles ~40 tiny train-step programs; on the 1-core CPU host
# the XLA optimization passes dominate wall time (measured 193 s -> 119 s
# for the heaviest config-matrix case at level 0) and tiny-shape execution
# doesn't benefit from them.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# jax may already be imported by a pytest plugin (jaxtyping) with the shell's
# JAX_PLATFORMS (e.g. "axon") bound — override via the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: repeat suite runs skip recompilation entirely
# (the first run of the slow gate is compile-dominated).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
