"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests use
XLA's host-platform device virtualization instead (the same programs run
unchanged on a real TPU mesh).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = os.environ.get("EE_TEST_PLATFORM", "cpu")

import jax  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process spawns)")


# Force CPU regardless of the ambient platform: this image ships an
# `axon.register` import hook that force-appends the tunnelled TPU platform
# to jax_platforms during `import jax`, overriding the env var — so the
# config must be re-set AFTER the import. EE_TEST_PLATFORM overrides.
jax.config.update("jax_platforms", os.environ.get("EE_TEST_PLATFORM", "cpu"))
jax.config.update("jax_default_matmul_precision", "highest")
