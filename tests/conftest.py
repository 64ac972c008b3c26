# SPDX-License-Identifier: Apache-2.0
"""Test bootstrap: force CPU with 8 virtual devices for sharding tests.

The driver environment registers the TPU (axon) PJRT plugin from a
sitecustomize hook that imports jax before pytest starts, so plain env vars
are too late — use jax.config.update.  Set VLLM_METAL_TPU_TEST_ON_TPU=1 to
run the suite against the real chip instead.

Mirrors the reference's deterministic seeding fixture
(``/root/reference/tests/conftest.py:26-43``), adapted to JAX.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("VLLM_METAL_TPU_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    # backend may not be initialized yet; host device count flag applies at
    # first backend init, which happens on first jax.devices()/computation.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def deterministic_seed():
    seed = int(os.environ.get("VLLM_METAL_TPU_TEST_SEED", "0"))
    np.random.seed(seed)
    import random
    random.seed(seed)
    yield
