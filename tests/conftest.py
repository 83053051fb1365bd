"""Test configuration: force an 8-device virtual CPU mesh before JAX loads,
so multi-chip sharding tests run anywhere (SURVEY.md §4 implication).

NOTE the axon TPU plugin in this environment ignores the JAX_PLATFORMS
env var, so the platform must be pinned via jax.config.update BEFORE any
backend is initialized (otherwise the whole suite silently runs over the
TPU tunnel).
"""

import os

# WSUNET_TEST_TPU=1 opts into running on the real accelerator (used by the
# TPU-gated parity tests, e.g. tests/test_tpu_pallas_parity.py); default is
# the hermetic 8-device virtual CPU mesh.
_USE_TPU = os.environ.get("WSUNET_TEST_TPU") == "1"

if not _USE_TPU:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE.exists():
        pytest.skip("reference fixture data not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def data_root(reference_root) -> pathlib.Path:
    return reference_root / "data"


@pytest.fixture(scope="session")
def results_root(reference_root) -> pathlib.Path:
    return reference_root / "results"
