"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip hardware is not available in CI; sharding tests use the standard
mesh-on-CPU trick (XLA_FLAGS=--xla_force_host_platform_device_count=8).

This environment force-registers the 'axon' TPU platform through a
sitecustomize hook that overrides JAX_PLATFORMS, so the env var alone is not
enough — we flip the `jax_platforms` config after import and clear any
already-initialized backends.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends
    clear_backends()
except Exception:
    pass

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_eval_dir():
    """Path to the reference repo's committed eval artifacts (golden data)."""
    path = os.path.join(REFERENCE_DIR, "eval")
    if not os.path.isdir(path):
        pytest.skip("reference eval artifacts not available")
    return path
