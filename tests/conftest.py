"""Test harness: force CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware.

The environment's sitecustomize registers the axon TPU PJRT plugin in every process
and pins `jax_platforms` there, so the env var alone is not enough — we override the
config after import, before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("E2EFT_TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler has segfaulted when dozens of large grad-graph
    executables accumulate in one process (observed at test_train_step's second
    train-step compile during full-suite runs). Dropping compiled executables
    between test modules keeps compiler arena pressure bounded."""
    yield
    jax.clear_caches()
