"""Test configuration: CPU with 8 virtual devices, or real-TPU mode.

Default: multi-device sharding tests run on a virtual 8-device CPU mesh
(``xla_force_host_platform_device_count``), the TPU-world way to test
distributed code without a pod (SURVEY.md §4 item 4), and Pallas kernels
run in interpret mode (via :func:`pallas_test_mode` below). Must run
before jax initializes its backends, hence env mutation at import time.

``CL3D_TPU_TESTS=1`` (VERDICT r3 item 6) flips the kernel-parity modules
to COMPILED-on-device execution against the real TPU: the platform
forcing is skipped, interpret mode stays off, and every module outside
the kernel/ops allowlist is skipped (they need 8 virtual devices or are
host-only). Usage, on a machine with the TPU attached::

    CL3D_TPU_TESTS=1 python -m pytest tests/ -q

This runs the SAME pallas-vs-jnp comparisons (fwd + VJP, all six kernel
families) that gate every CPU run, but with the production compiled
kernels — catching layout/precision/predication divergences that
interpret mode cannot see.
"""

import os

TPU_TESTS = os.environ.get("CL3D_TPU_TESTS") == "1"

if not TPU_TESTS:
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
if not TPU_TESTS:
    jax.config.update("jax_platforms", "cpu")

if TPU_TESTS:
    # Tolerance calibration for the compiled-on-device mode (VERDICT r4
    # item 1b): the parity tests compare Pallas kernels against jnp
    # reference paths at f32, but a TPU f32 jnp matmul runs ONE-PASS
    # bf16 under DEFAULT precision — the *reference* then carries ~1e-2
    # relative rounding (worse under cancellation) and the comparison
    # measures reference sloppiness, not kernel logic. Forcing HIGHEST
    # makes every f32 jnp matmul f32-accurate (the f32 kernel paths
    # already pass Precision.HIGHEST explicitly), so the CPU-calibrated
    # tolerances transfer and any remaining divergence is a real logic/
    # layout/predication bug. The production bf16 path keeps DEFAULT
    # via cfg.precision="bf16" (bench + training), unaffected by tests.
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules that are meaningful against one real chip: kernel-vs-reference
# parity (compiled Pallas vs jnp) and op-level numpy refs. Everything
# else needs the 8-device virtual mesh, subprocesses, or host-only
# machinery and is skipped in TPU mode.
TPU_MODULES = (
    "test_pallas_aggregation.py",
    "test_pallas_moments.py",
    "test_pallas_multichunk.py",
    "test_pallas_neighbors.py",
    "test_pallas_pwmlp.py",
    "test_spatial.py",
    "test_ops_interpolate.py",
    "test_ops_neighbors.py",
    "test_ops_sampling.py",
)


def pallas_test_mode(monkeypatch, ops_impl=None):
    """Kernel-test env: interpret-mode Pallas on CPU, compiled on TPU.

    The per-module autouse fixtures call this so one switch
    (``CL3D_TPU_TESTS=1``) retargets the whole parity suite at the
    real chip without duplicating any test code.
    """
    if not TPU_TESTS:
        monkeypatch.setenv("CL3D_PALLAS_INTERPRET", "1")
    else:
        # an ambient interpret flag would silently run the "compiled"
        # parity suite in interpret mode (ADVICE r4)
        monkeypatch.delenv("CL3D_PALLAS_INTERPRET", raising=False)
    if ops_impl is not None:
        monkeypatch.setenv("CL3D_OPS_IMPL", ops_impl)


def pytest_collection_modifyitems(config, items):
    if not TPU_TESTS:
        return
    skip = pytest.mark.skip(
        reason="needs the 8-virtual-device CPU mesh (unset CL3D_TPU_TESTS)")
    for item in items:
        if os.path.basename(str(item.fspath)) not in TPU_MODULES:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
