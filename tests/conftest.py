"""Test environment: force CPU with 8 virtual devices (SURVEY.md §4.4).

Must set env vars BEFORE jax import so mesh/shard_map/collective tests run
with no TPU and no cluster; Pallas kernels run in interpret mode on CPU.
"""

import os

# Force CPU even if the shell exports JAX_PLATFORMS=axon (the real chip is
# reserved for bench.py; unit tests must be hermetic and CPU-runnable).
# NOTE: the axon PJRT plugin overrides the JAX_PLATFORMS env var, so the
# config must be set through jax.config AFTER import (verified: env-var
# alone still selects the TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
