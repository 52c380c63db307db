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
