"""TPU-only tests for the fused Monte-Carlo kernels.

The TPU PRNG has no CPU interpreter lowering, so these run only on real
hardware:  CONVCODES_TEST_TPU=1 python -m pytest tests/test_fused_tpu.py -q

They validate end-to-end statistics (the kernels were additionally
cross-validated at 1e9+-bit sample sizes against the threefry modular
chain and the published curves — see git history / results/).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma
from convolutional_codes_tpu.ops.fused_chain import mc_chain_viterbi

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="fused kernels are TPU-only")


def _ber(channel, param, code_key=0, demapper="soft", B=65536, NS=4):
    code = get_code(code_key)
    be, fe = mc_chain_viterbi(code, B, NS, jnp.int32(11), param, channel,
                              block_lanes=1024, demapper=demapper)
    bits = B * NS * code.block_length
    return int(be.sum()) / bits, bits


def binomial_ok(ber, bits, expected, cluster=8.0, z=5.0):
    sigma = np.sqrt(cluster * expected * (1 - expected) / bits)
    return abs(ber - expected) <= z * sigma + cluster / bits


def test_awgn_soft_8db():
    ber, bits = _ber("awgn", float(awgn_sigma(8.0)))
    assert binomial_ok(ber, bits, 1.3756e-4), ber


def test_awgn_hard_demapper_8db():
    ber, bits = _ber("awgn", float(awgn_sigma(8.0)), demapper="hard")
    assert binomial_ok(ber, bits, 2.23931e-3), ber


def test_bsc_p0125():
    ber, bits = _ber("bsc", 0.0125)
    assert binomial_ok(ber, bits, 9.545e-3), ber


def test_quirky_code_awgn():
    """Code 3 (compat-parity quirk on P0) at 6 dB: published 2.478e-4."""
    ber, bits = _ber("awgn", float(awgn_sigma(6.0)), code_key=3, NS=8)
    assert binomial_ok(ber, bits, 2.478e-4), ber


def test_noiseless_is_exact():
    ber, _ = _ber("awgn", 0.0, B=4096, NS=1)
    assert ber == 0.0
    ber2, _ = _ber("bsc", 0.0, B=4096, NS=1)
    assert ber2 == 0.0


def test_k7_pallas_matches_xla_on_device():
    """Guards against MXU precision regressions: the one-hot matmul path
    must be bit-identical to the XLA decode on real hardware (default MXU
    f32 truncates to bf16 — requires Precision.HIGHEST)."""
    from convolutional_codes_tpu.ops.viterbi import viterbi_decode_soft

    code = get_code("nasa-k7")
    key = jax.random.PRNGKey(3)
    dists = jax.random.uniform(
        key, (512, code.num_block_symbols, code.points_per_symbol)) * 10.0
    a = np.asarray(viterbi_decode_soft(code, dists, backend="pallas"))
    b = np.asarray(viterbi_decode_soft(code, dists, backend="xla"))
    assert np.array_equal(a, b)


def test_long_frame_chunked_decode_on_device():
    from convolutional_codes_tpu.ops.channels import awgn
    from convolutional_codes_tpu.ops.demapper import soft_demap
    from convolutional_codes_tpu.ops.encoder import encode_stream
    from convolutional_codes_tpu.ops.mapper import map_symbols
    from convolutional_codes_tpu.parallel.streaming import (
        long_frame_decode_pallas, monolithic_reference_decode)

    code = get_code("nasa-k7")
    B, T = 256, 2048
    L = T - (code.constraint_length - 1)
    key = jax.random.PRNGKey(9)
    kb, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (B, L)).astype(jnp.int32)
    syms = encode_stream(code, bits, terminate=True)
    rx = awgn(kn, map_symbols(code, syms), awgn_sigma(4.0))
    dists = soft_demap(code.symlen_out, rx)
    out = np.asarray(long_frame_decode_pallas(code, dists))
    mono = np.asarray(monolithic_reference_decode(code, dists[:32]))
    assert np.array_equal(out[:32], mono)
    assert (out[:, :L] != np.asarray(bits)).mean() < 1e-3
