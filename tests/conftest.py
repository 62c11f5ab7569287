"""Test config: run the suite on a virtual 8-device CPU mesh.

Unit tests exercise numerics and sharding logic; the driver benches on real
TPU separately. 8 virtual CPU devices let multi-chip sharding tests
(tp/dp over jax.sharding.Mesh) run anywhere (SURVEY.md §4: the reference has
no distributed tests; this is our equivalent).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax and pins jax_platforms to the TPU
# backend before any test code runs, so env vars alone can't force CPU —
# update the live config instead (backends initialize lazily, so this wins
# as long as it happens before first device use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
