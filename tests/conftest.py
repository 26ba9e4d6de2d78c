"""Test harness: force an 8-virtual-device CPU platform before JAX init.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX pattern
for testing pjit/shard_map code without a TPU pod). Set GFLOW_TEST_TPU=1 to
run the suite on real hardware instead.

Note: this environment preinstalls a sitecustomize that registers the TPU
plugin and overrides JAX_PLATFORMS, so the env var alone is not enough —
jax.config must be updated in-process before first backend use.
"""
import os
import sys

if os.environ.get("GFLOW_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
