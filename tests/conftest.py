"""Test harness: force CPU backend with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4 'Implication for the TPU
build'). Must run before jax is imported anywhere."""

import os

# Force-override: the environment pins JAX_PLATFORMS=axon (TPU) and a
# sitecustomize imports jax at interpreter startup, so the env var is already
# baked into jax.config by the time this file runs. Unit tests must run on CPU
# with virtual devices (TPU convs default to bf16 on the MXU, which breaks f32
# golden-parity tolerances), so override via jax.config before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules dominated by full-network jit compiles (minutes each on the CPU
# backend). `pytest -m "not slow"` is the <5 min inner loop; the full suite
# (including these) is the round-boundary gate.
_SLOW_MODULES = {
    "test_train_e2e", "test_refvsr_net", "test_refvsr_ir", "test_parallel",
    "test_spynet_parity", "test_matching_parity", "test_loader",
    "test_cli_train", "test_pretrained_assets",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-network compile-heavy tests (round gate)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
