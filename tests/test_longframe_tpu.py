"""TPU-only exactness probes for the streaming long-frame decode kernels.

The interpret-mode suite (tests/test_longframe_pallas.py) proves the
kernels; these runs prove the SAME bit-exact equality against the XLA
monolithic decoder on real hardware — Mosaic compilation, sublane
deinterleave lowering and the strict-less tie-breaks must survive the
TPU float pipeline:

  CONVCODES_TEST_TPU=1 python -m pytest tests/test_longframe_tpu.py -q
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.models.trellis import build_trellis
from convolutional_codes_tpu.ops.channels import awgn, awgn_sigma
from convolutional_codes_tpu.ops.demapper import soft_demap
from convolutional_codes_tpu.ops.encoder import encode_stream
from convolutional_codes_tpu.ops.mapper import map_symbols
from convolutional_codes_tpu.ops.viterbi import (
    acs_forward, hard_branch_metrics, traceback_from)
from convolutional_codes_tpu.parallel.streaming import (
    long_frame_decode_stream)

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="hardware exactness probes")


def _mono(code, d, hard):
    trellis = build_trellis(code)
    B = d.shape[0]
    init = jnp.full((B, trellis.num_states), jnp.inf,
                    jnp.float32).at[:, 0].set(0.0)
    fm, dec = acs_forward(trellis, d.astype(jnp.float32), hard, init)
    return traceback_from(trellis, dec,
                          jnp.argmin(fm, axis=-1).astype(jnp.int32))


@pytest.mark.parametrize("key,snr", [(0, 6.0), ("nasa-k7", 4.0),
                                     ("k9-r12", 5.0)])
def test_stream_decode_exact_on_chip_soft(key, snr):
    code = get_code(key)
    B, T = 32, 4096
    L = T - (code.constraint_length - 1)
    k = jax.random.PRNGKey(17)
    kb, kn = jax.random.split(k)
    bits = jax.random.bernoulli(kb, 0.5, (B, L)).astype(jnp.int32)
    syms = encode_stream(code, bits, terminate=True)
    d = soft_demap(code.symlen_out,
                   awgn(kn, map_symbols(code, syms),
                        jnp.float32(awgn_sigma(snr))))
    out = long_frame_decode_stream(code, d)
    ref = _mono(code, d, False)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_stream_decode_exact_on_chip_hard():
    code = get_code("k3-75")
    B, T = 32, 4096
    L = T - (code.constraint_length - 1)
    k = jax.random.PRNGKey(23)
    kb, kf = jax.random.split(k)
    bits = jax.random.bernoulli(kb, 0.5, (B, L)).astype(jnp.int32)
    syms = encode_stream(code, bits, terminate=True)
    flips = jax.random.bernoulli(kf, 0.0125, syms.shape + (code.symlen_out,))
    fl = jnp.sum(flips.astype(jnp.int32) << jnp.arange(code.symlen_out), -1)
    d = hard_branch_metrics(code, syms ^ fl).astype(jnp.float32)
    out = long_frame_decode_stream(code, d, hard=True)
    ref = _mono(code, d, True)
    assert np.array_equal(np.asarray(out), np.asarray(ref))
