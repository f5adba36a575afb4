"""Test harness: force a virtual 8-device CPU platform so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize pre-imports jax and registers the
axon TPU plugin in every process, and jax reads JAX_PLATFORMS at import
time — so env vars are too late here; `jax.config.update` is the only
reliable override. XLA_FLAGS is still read at CPU-client init, which
has not happened yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, not the real TPU"
    )
