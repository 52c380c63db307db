"""Batched stack decoder vs pinned C-reference goldens (exact, per-bit)."""

import numpy as np
import pytest

from conftest import load_golden
from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.encoder import encode
from convolutional_codes_tpu.ops.stack import stack_decode_soft, stack_decode_hard

ALL_CODES = [0, 1, 2, 3, 4, 5]


@pytest.mark.parametrize("idx", ALL_CODES)
@pytest.mark.parametrize("mode", [0, 1])
def test_soft_matches_reference(idx, mode):
    g = load_golden(f"stack_soft_{idx}_m{mode}.npz")
    code = get_code(idx)
    out = np.asarray(stack_decode_soft(code, g["dists"]))
    assert np.array_equal(out, g["decoded"])


@pytest.mark.parametrize("idx", ALL_CODES)
@pytest.mark.parametrize("mode", [0, 1])
def test_hard_matches_reference(idx, mode):
    g = load_golden(f"stack_hard_{idx}_m{mode}.npz")
    code = get_code(idx)
    out = np.asarray(stack_decode_hard(code, g["received"]))
    assert np.array_equal(out, g["decoded"])


@pytest.mark.parametrize("idx", [0, 4, "k9-r12"])
def test_noiseless_roundtrip(idx):
    code = get_code(idx)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, size=(8, code.block_length))
    syms = np.asarray(encode(code, bits))
    dec = stack_decode_hard(code, syms)
    assert np.array_equal(np.asarray(dec), bits)
    M = code.points_per_symbol
    dists = np.ones(syms.shape + (M,), np.float32)
    np.put_along_axis(dists, syms[..., None], 0.0, axis=-1)
    dec2 = stack_decode_soft(code, dists)
    assert np.array_equal(np.asarray(dec2), bits)
