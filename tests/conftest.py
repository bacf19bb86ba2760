"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), the TPU-world way to test
distributed code without a pod (SURVEY.md §4 item 4). Must run before
jax initializes its backends, hence env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # see note below
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize runs register() at interpreter
# start and forces jax.config jax_platforms="axon,cpu", silently routing
# "CPU" tests onto the remote TPU (slow remote compiles, bf16 matmuls).
# Env mutation above is too late for sitecustomize; override the config
# knob directly before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
