"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Per SURVEY.md §4, multi-device behavior is validated with
xla_force_host_platform_device_count=8 — the standard JAX analog of a fake
cluster — so the suite runs anywhere without TPU hardware.

Note: this machine's sitecustomize registers an 'axon' TPU backend and
overwrites jax_platforms, so the env var alone is not enough; we re-force
the platform via jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))
assert jax.device_count() == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
