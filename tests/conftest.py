"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the same way the driver
does it: XLA host-platform device multiplexing. NOTE: this environment presets
JAX_PLATFORMS=axon (the TPU tunnel); both the env override *and* the explicit
config update are needed to reliably pin tests to the host CPU backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running large-size parity tests")
