"""Native C runtime vs goldens + fuzz cross-check against the JAX path."""

import numpy as np
import pytest

from conftest import load_golden
from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.encoder import encode
from convolutional_codes_tpu.ops.viterbi import viterbi_decode_soft, viterbi_decode_hard
from convolutional_codes_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C compiler / native lib")


@pytest.mark.parametrize("idx", range(6))
def test_native_encoder_matches_goldens(idx):
    g = load_golden(f"enc_{idx}.npz")
    code = get_code(idx)
    out = native.encode_blocks(code, g["bits"])
    assert np.array_equal(out, g["symbols"])


@pytest.mark.parametrize("idx", [0, 1, 2, 3, 5])
@pytest.mark.parametrize("mode", [0, 1])
def test_native_viterbi_matches_goldens(idx, mode):
    code = get_code(idx)
    gs = load_golden(f"viterbi_soft_{idx}_m{mode}.npz")
    assert np.array_equal(native.viterbi_soft_blocks(code, gs["dists"]),
                          gs["decoded"])
    gh = load_golden(f"viterbi_hard_{idx}_m{mode}.npz")
    bits, metrics = native.viterbi_hard_blocks(code, gh["received"].astype(np.int32))
    assert np.array_equal(bits, gh["decoded"])
    assert np.array_equal(metrics, gh["metrics"])


@pytest.mark.parametrize("idx", [0, 3, 5, "nasa-k7"])
def test_fuzz_jax_vs_native(idx):
    """Random-input fuzz: JAX pipeline must agree with the native oracle."""
    code = get_code(idx)
    rng = np.random.default_rng(hash(str(idx)) % 2**32)
    N, T, M = 64, code.num_block_symbols, code.points_per_symbol

    bits = rng.integers(0, 2, size=(N, code.block_length))
    assert np.array_equal(np.asarray(encode(code, bits)),
                          native.encode_blocks(code, bits))

    dists = rng.random((N, T, M)).astype(np.float32)
    assert np.array_equal(np.asarray(viterbi_decode_soft(code, dists)),
                          native.viterbi_soft_blocks(code, dists))

    rx = rng.integers(0, M, size=(N, T)).astype(np.int32)
    jb, jm = viterbi_decode_hard(code, rx)
    nb, nm = native.viterbi_hard_blocks(code, rx)
    assert np.array_equal(np.asarray(jb), nb)
    assert np.array_equal(np.asarray(jm), nm)
