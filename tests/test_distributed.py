"""Multi-host entry point + scaling harness (parallel/distributed.py)."""

import jax
import numpy as np

from convolutional_codes_tpu.parallel.distributed import (
    initialize_from_env, measure_scaling)


def test_initialize_noop_without_env(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
              "JAX_PROCESS_ID", "JAX_AUTO_DISTRIBUTED"):
        monkeypatch.delenv(k, raising=False)
    assert initialize_from_env() is False


def test_scaling_harness_runs():
    pts = measure_scaling(frames_per_device=32, nsteps=1,
                          device_counts=[1, min(2, jax.device_count())],
                          repeats=1)
    assert pts[0].devices == 1 and pts[0].efficiency == 1.0
    for p in pts:
        assert p.bits == p.devices * 32 * 40      # code 0 block_len
        assert np.isfinite(p.bits_per_s) and p.bits_per_s > 0
