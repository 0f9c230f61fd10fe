"""Test harness config: force CPU with 8 virtual devices (SURVEY.md SS5.3) so
mesh/collective tests run without TPU hardware. Must run before jax imports.
"""

import os

# Force CPU with 8 virtual devices DETERMINISTICALLY. Env vars alone are not
# enough: this sandbox's sitecustomize imports jax at interpreter start and,
# when the TPU tunnel is free, registers the axon plugin and explicitly sets
# jax_platforms='axon,cpu' — so whether pytest saw TPU or CPU used to depend
# on tunnel contention. jax.config wins over everything, and
# jax_num_cpu_devices replaces the XLA_FLAGS count (which a backend reset
# does not re-read).
os.environ["JAX_PLATFORMS"] = "cpu"   # for subprocesses spawned by tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long e2e CLI flows (still run by default in CI)")


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
