"""Test config: run JAX on CPU with 8 virtual devices so mesh/collective
tests work without TPU hardware (SURVEY.md §4 multi-host testing strategy).

Note: this environment preimports jax via sitecustomize with
JAX_PLATFORMS=axon (a tunneled TPU), so the env-var route is too late —
we must override through jax.config before any backend initialization.
"""

import os

TPU_MODE = bool(os.environ.get("CONVCODES_TEST_TPU"))

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def goldens_dir():
    return GOLDENS


def load_golden(name):
    return np.load(os.path.join(GOLDENS, name))


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop JAX's in-process executable caches after each test module.

    One long pytest process accumulates hundreds of compiled CPU
    executables (the interpret-mode Pallas suites especially); on this
    box jax 0.9's CPU backend segfaults inside LLVM
    (backend_compile_and_load) late in the full-suite run once that
    state piles up — observed twice on 2026-08-21 at
    test_viterbi.py::test_noiseless_roundtrip while the same file and
    the suite tail pass in isolation.  Clearing per module bounds the
    accumulation; cross-module executable reuse is minimal, so the
    runtime cost is small."""
    yield
    jax.clear_caches()
