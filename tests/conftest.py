"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run identically with or without TPU hardware, and must exercise the
data-parallel mesh path (SURVEY.md §4 takeaway: add multi-device CPU-mesh tests
the reference lacks).

NOTE: the JAX_PLATFORMS env var alone is not enough on machines where a TPU
PJRT plugin (axon) registers itself — ``jax.config.update('jax_platforms', …)``
is authoritative.  XLA_FLAGS must still be set before JAX initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def sample_config():
    from kokoro_tpu.config import get_smoke_test_config

    return get_smoke_test_config()
