"""Test harness config: force CPU with 8 virtual devices (SURVEY.md SS5.3) so
mesh/collective tests run without TPU hardware. Must run before jax imports.
"""

import os

# hard override: the ambient env points JAX at the TPU tunnel (axon); tests
# must run on CPU with a virtual 8-device mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
