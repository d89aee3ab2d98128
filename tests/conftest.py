"""Test configuration: force CPU with a virtual 8-device mesh and float64.

Per the build contract, sharding is tested on a virtual CPU mesh
(xla_force_host_platform_device_count=8); the real TPU chip is exercised only by
bench.py. Must set env vars before jax imports anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
