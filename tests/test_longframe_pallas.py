"""Streaming long-frame decode kernels vs the monolithic XLA decoder.

The stream kernels must be BIT-IDENTICAL to ops.viterbi's scan decode —
same float expression order, same strict-less tie-breaks — so equality is
exact, not statistical (unlike the overlap-save lanes path, whose
equality holds only up to warmup convergence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.models.trellis import build_trellis
from convolutional_codes_tpu.ops.channels import awgn, awgn_sigma
from convolutional_codes_tpu.ops.demapper import soft_demap
from convolutional_codes_tpu.ops.encoder import encode_stream
from convolutional_codes_tpu.ops.longframe_pallas import (
    _pick_chunk, stream_acs_pallas, stream_decode, stream_traceback_pallas)
from convolutional_codes_tpu.ops.mapper import map_symbols
from convolutional_codes_tpu.ops.viterbi import (
    acs_forward, hard_branch_metrics, traceback_from)
from convolutional_codes_tpu.ops.viterbi_pallas import BIG_METRIC


def _soft_dists(code, key, B, L, snr_db=4.0):
    kb, kn = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (B, L)).astype(jnp.int32)
    syms = encode_stream(code, bits, terminate=True)
    d = soft_demap(code.symlen_out,
                   awgn(kn, map_symbols(code, syms),
                        jnp.float32(awgn_sigma(snr_db))))
    return bits, d


def _monolithic(code, dists_btm, hard):
    trellis = build_trellis(code)
    B = dists_btm.shape[0]
    init = jnp.full((B, trellis.num_states), jnp.inf,
                    jnp.float32).at[:, 0].set(0.0)
    fm, dec = acs_forward(trellis, dists_btm.astype(jnp.float32), hard, init)
    return traceback_from(trellis, dec,
                          jnp.argmin(fm, axis=-1).astype(jnp.int32))


# code 0's generators share (1+D) — catastrophic on long frames (PERF §4
# history), so its case runs at an SNR where error smearing cannot start
@pytest.mark.parametrize("key_name,snr", [(0, 6.0), ("nasa-k7", 4.0),
                                          ("k9-r12", 5.0)])
def test_stream_decode_equals_monolithic_soft(key_name, snr):
    code = get_code(key_name)
    B, L = 8, 192 - (code.constraint_length - 1)
    bits, d = _soft_dists(code, jax.random.PRNGKey(3), B, L, snr)
    ref = _monolithic(code, d, False)
    trellis = build_trellis(code)
    out = stream_decode(trellis, jnp.transpose(d, (1, 2, 0)),
                        hard=False, chunk=32, interpret=True)
    assert np.array_equal(np.asarray(out).T, np.asarray(ref))
    # and it actually decodes: errors only where the channel beat the code
    assert np.mean(np.asarray(out).T[:, :L] != np.asarray(bits)) < 0.2


def test_stream_decode_hard_bsc():
    code = get_code(0)
    trellis = build_trellis(code)
    B, L = 16, 126
    key = jax.random.PRNGKey(11)
    kb, kf = jax.random.split(key)
    bits = jax.random.bernoulli(kb, 0.5, (B, L)).astype(jnp.int32)
    syms = encode_stream(code, bits, terminate=True)
    flips = jax.random.bernoulli(kf, 0.05, syms.shape + (code.symlen_out,))
    fl = jnp.sum(flips.astype(jnp.int32) << jnp.arange(code.symlen_out), -1)
    d = hard_branch_metrics(code, syms ^ fl).astype(jnp.float32)
    ref = _monolithic(code, d, True)
    out = stream_decode(trellis, jnp.transpose(d, (1, 2, 0)), hard=True,
                        chunk=16, interpret=True)
    assert np.array_equal(np.asarray(out).T, np.asarray(ref))


def test_stream_acs_matches_xla_forward():
    """Final metrics and packed decisions equal the XLA forward pass."""
    code = get_code("nasa-k7")
    trellis = build_trellis(code)
    S = trellis.num_states
    B, L = 4, 58
    _, d = _soft_dists(code, jax.random.PRNGKey(7), B, L, 3.0)
    T = d.shape[1]
    init_bs = jnp.full((B, S), jnp.inf, jnp.float32).at[:, 0].set(0.0)
    fm_ref, dec_ref = acs_forward(trellis, d.astype(jnp.float32), False,
                                  init_bs)
    init_sb = jnp.full((S, B), BIG_METRIC, jnp.float32).at[0, :].set(0.0)
    fm, dec = stream_acs_pallas(trellis, jnp.transpose(d, (1, 2, 0)),
                                init_sb, False, chunk=_pick_chunk(T),
                                interpret=True)
    assert np.array_equal(np.asarray(fm).T, np.asarray(fm_ref))
    assert np.array_equal(np.asarray(dec), np.asarray(dec_ref))


def test_stream_traceback_carry_segmented():
    """Two-segment traceback with the state carry equals one-shot."""
    code = get_code(0)
    trellis = build_trellis(code)
    B, L = 8, 62
    _, d = _soft_dists(code, jax.random.PRNGKey(9), B, L, 2.0)
    T = d.shape[1]
    d_tmb = jnp.transpose(d, (1, 2, 0))
    init = jnp.full((trellis.num_states, B), BIG_METRIC,
                    jnp.float32).at[0, :].set(0.0)
    fm, dec = stream_acs_pallas(trellis, d_tmb, init, False, chunk=16,
                                interpret=True)
    start = jnp.argmin(fm, axis=0).astype(jnp.int32)
    full, cur_full = stream_traceback_pallas(trellis, dec, start, chunk=16,
                                             interpret=True)
    hi, cur_mid = stream_traceback_pallas(trellis, dec[T // 2:], start,
                                          chunk=16, interpret=True)
    lo, cur0 = stream_traceback_pallas(trellis, dec[:T // 2], cur_mid,
                                       chunk=16, interpret=True)
    assert np.array_equal(np.asarray(full),
                          np.concatenate([np.asarray(lo), np.asarray(hi)]))
    assert np.array_equal(np.asarray(cur_full), np.asarray(cur0))


def test_long_frame_decode_stream_entry():
    """Production entry point: [B, T, M] in, [B, T] out, exact."""
    from convolutional_codes_tpu.parallel.streaming import (
        long_frame_decode_stream)

    code = get_code("nasa-k7")
    B, L = 4, 250
    bits, d = _soft_dists(code, jax.random.PRNGKey(5), B, L, 6.0)
    ref = _monolithic(code, d, False)
    out = long_frame_decode_stream(code, d, chunk=32, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(ref))
    assert np.array_equal(np.asarray(out)[:, :L], np.asarray(bits))


def test_pick_chunk():
    assert _pick_chunk(65536) == 256
    assert _pick_chunk(48) == 16
    assert _pick_chunk(41) == 1
    assert _pick_chunk(6) == 2
