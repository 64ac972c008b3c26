# SPDX-License-Identifier: Apache-2.0
"""Test bootstrap: force CPU with 8 virtual devices for sharding tests.

Mirrors the reference's deterministic seeding fixture
(``/root/reference/tests/conftest.py:26-43``), adapted to JAX.
"""

import os

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def deterministic_seed():
    seed = int(os.environ.get("VLLM_METAL_TPU_TEST_SEED", "0"))
    np.random.seed(seed)
    import random
    random.seed(seed)
    yield
