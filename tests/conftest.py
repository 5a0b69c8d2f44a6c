"""Test harness: simulate an 8-device TPU mesh on CPU.

Must set the XLA flags before jax initializes its backends (SURVEY.md §4:
the reference has no multi-node test story; we substitute a virtual mesh).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset e.g. "axon"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a pytest plugin (jaxtyping) with the shell's
# JAX_PLATFORMS (e.g. "axon") bound — override via the live config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
