"""Test harness: force an 8-virtual-device CPU platform so multi-chip
sharding logic is exercised without TPU hardware (the driver's real-TPU bench
runs separately via bench.py).

Note: the environment's TPU plugin overrides JAX_PLATFORMS, so we must also
call jax.config.update after import — env vars alone are not honored here.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
