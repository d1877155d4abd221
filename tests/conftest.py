"""Test harness config: run the suite on a virtual 8-device CPU mesh.

Must set env vars before the first `import jax` anywhere in the test
process, hence top-of-conftest.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU tunnel backend via
# jax.config at import time, overriding JAX_PLATFORMS from the env; undo it
# so the test suite runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
