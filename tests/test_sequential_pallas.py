"""VMEM Pallas sequential-decoder kernels vs C-reference goldens and the
XLA formulations (interpret mode on CPU; bit-exact).

The heavier m1 golden batches (30 noisy frames) run for code 0 only to keep
interpret-mode runtime bounded; the m0 batches cover all six codes incl.
WSPR (K=32 states in uint32 lanes).
"""

import os

import numpy as np
import pytest

from conftest import load_golden
from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.stack_pallas import stack_decode_pallas
from convolutional_codes_tpu.ops.fano_pallas import fano_decode_pallas

ALL_CODES = [0, 1, 2, 3, 4, 5]
# Fano goldens include timeout-bound frames (budget 10000 x block_len
# lockstep microsteps) that cost minutes each under the Pallas interpreter;
# the XLA-path tests (test_fano.py) pin all six codes against the same
# goldens, so the default interpret run keeps only the base code.  Set
# CONVCODES_TEST_FULL=1 for the full six-code interpret sweep.
FANO_CODES = ALL_CODES if os.environ.get("CONVCODES_TEST_FULL") else [0]


@pytest.mark.parametrize("idx", ALL_CODES)
def test_stack_soft_matches_reference(idx):
    g = load_golden(f"stack_soft_{idx}_m0.npz")
    out = stack_decode_pallas(get_code(idx), g["dists"], soft=True,
                              interpret=True, iters_per_call=65536, iters_first=8192)
    assert np.array_equal(np.asarray(out), g["decoded"])


@pytest.mark.parametrize("idx", ALL_CODES)
def test_stack_hard_matches_reference(idx):
    g = load_golden(f"stack_hard_{idx}_m0.npz")
    out = stack_decode_pallas(get_code(idx), g["received"], soft=False,
                              interpret=True, iters_per_call=65536, iters_first=8192)
    assert np.array_equal(np.asarray(out), g["decoded"])


@pytest.mark.parametrize("idx", FANO_CODES)
def test_fano_soft_matches_reference(idx):
    g = load_golden(f"fano_soft_{idx}_m0.npz")
    out = fano_decode_pallas(get_code(idx), g["dists"], soft=True,
                             interpret=True, iters_per_call=65536, iters_first=8192)
    assert np.array_equal(np.asarray(out), g["decoded"])


@pytest.mark.parametrize("idx", FANO_CODES)
def test_fano_hard_matches_reference(idx):
    g = load_golden(f"fano_hard_{idx}_m0.npz")
    out = fano_decode_pallas(get_code(idx), g["received"], soft=False,
                             interpret=True, iters_per_call=65536, iters_first=8192)
    assert np.array_equal(np.asarray(out), g["decoded"])


def test_stack_noisy_batch_and_metric_match_reference():
    """Bigger noisy batch (golden m1) + the winning-metric output the BSC
    callback carries (binary-symmetric-channel/include/decoder.h:9)."""
    from convolutional_codes_tpu.ops.stack import stack_decode_hard_with_metric

    g = load_golden("stack_soft_0_m1.npz")
    out = stack_decode_pallas(get_code(0), g["dists"], soft=True,
                              interpret=True, iters_per_call=65536, iters_first=8192)
    assert np.array_equal(np.asarray(out), g["decoded"])

    gh = load_golden("stack_hard_0_m1.npz")
    bx, mx = stack_decode_hard_with_metric(get_code(0), gh["received"])
    bp, mp = stack_decode_pallas(get_code(0), gh["received"], soft=False,
                                 interpret=True, iters_per_call=65536, iters_first=8192,
                                 with_metric=True)
    assert np.array_equal(np.asarray(bx), np.asarray(bp))
    assert np.array_equal(np.asarray(mx), np.asarray(mp))


def test_fano_noisy_batch_and_diag_match_xla():
    """Noisy m1 batch + diagnostics parity with the XLA machine (timeout
    accounting, depth, final metric)."""
    from convolutional_codes_tpu.ops.fano import fano_decode_soft_with_diag

    g = load_golden("fano_soft_0_m1.npz")
    code = get_code(0)
    out = fano_decode_pallas(code, g["dists"], soft=True,
                             interpret=True, iters_per_call=65536, iters_first=8192)
    assert np.array_equal(np.asarray(out), g["decoded"])

    bits_x, diag_x = fano_decode_soft_with_diag(code, g["dists"], 100)
    bits_p, diag_p = fano_decode_pallas(code, g["dists"], soft=True,
                                        timeout_per_bit=100, interpret=True,
                                        iters_per_call=65536, iters_first=8192, with_diag=True)
    assert np.array_equal(np.asarray(bits_x), np.asarray(bits_p))
    for k in ("metric", "timeout_left", "depth", "timed_out"):
        assert np.array_equal(np.asarray(diag_x[k]), np.asarray(diag_p[k])), k
