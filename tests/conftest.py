"""Test configuration: force CPU with a virtual 8-device mesh and float64.

Per the build contract, sharding is tested on a virtual CPU mesh
(xla_force_host_platform_device_count=8); the real TPU chip is exercised only by
bench.py. NOTE: this environment force-sets JAX_PLATFORMS=axon via sitecustomize,
so the env-var route is ignored — jax.config.update('jax_platforms', ...) is the
only override that sticks. XLA_FLAGS must still be set before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tests (run in CI/full sweeps)"
    )
