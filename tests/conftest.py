"""Test configuration: force CPU with 8 virtual devices so sharding tests
run anywhere (the standard JAX multi-host simulation trick).

NOTE: in this environment the JAX_PLATFORMS env var is ignored (an "axon"
TPU plugin takes priority); only jax.config.update("jax_platforms", ...)
after import reliably selects the backend. XLA_FLAGS must still be set
before import for the virtual device count.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-frame end-to-end parity runs")
