"""Batched Viterbi decoders: vectorized add-compare-select + traceback.

Reference semantics (soft: ``AWGN-channel/viterbi-decoder.c``, hard:
``binary-symmetric-channel/viterbi-decoder.c``):
  * block decoding over ``T = block_len + K - 1`` symbols,
  * init: state 0 metric 0, all others +INF / 0xFF00 (decoder_reset),
  * ACS over all states x 2 inputs per symbol, strict-less compare so the
    smaller predecessor index wins ties (receive_symbol loops s ascending),
  * hard metrics are Hamming distances saturated at 0xFF00 (:127-130),
  * full-block traceback from the global-minimum end state (traceback();
    the reference does NOT force end state 0 despite tail termination).

TPU formulation: the trellis butterfly makes ACS a dense
``[batch, states, 2]`` min-reduce — metrics of the two predecessors of every
new state are just the even/odd interleave of the metric vector (a reshape,
no gather), and branch metrics are a tiny gather from the ``2^m``-entry
distance vector via precomputed ``esym_prev`` tables.  The scan over symbols
is ``lax.scan``; decisions (one predecessor bit per new state) are stacked as
``[T, batch, S]`` and traced back with a reverse scan of per-frame gathers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.models.trellis import Trellis, build_trellis

#: Hard-decision metric saturation value (binary-symmetric-channel/
#: viterbi-decoder.c:127-130 and decoder_reset :222-232).
HARD_METRIC_SAT = 0xFF00


@functools.lru_cache(maxsize=None)
def _popcount_table(num_bits: int) -> np.ndarray:
    """[2^m, 2^m] int32: popcount(r ^ e) — Hamming branch-metric lookup."""
    n = 1 << num_bits
    r = np.arange(n)[:, None] ^ np.arange(n)[None, :]
    return np.array([[bin(x).count("1") for x in row] for row in r], dtype=np.int32)


def hard_branch_metrics(code: Code, received: jnp.ndarray) -> jnp.ndarray:
    """``[..., T]`` received symbols → ``[..., T, 2^m]`` Hamming distances
    to every possible expected symbol (int32)."""
    table = jnp.asarray(_popcount_table(code.symlen_out))
    return table[received]


def initial_metrics(trellis: Trellis, batch: int, hard: bool) -> jnp.ndarray:
    """State-0-pinned start metrics (decoder_reset: state 0 → 0, rest INF)."""
    S = trellis.num_states
    if hard:
        return jnp.full((batch, S), HARD_METRIC_SAT, jnp.int32).at[:, 0].set(0)
    return jnp.full((batch, S), jnp.inf, jnp.float32).at[:, 0].set(0.0)


def acs_forward(trellis: Trellis, branch_metrics: jnp.ndarray, hard: bool,
                init: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward ACS pass from arbitrary start metrics (streaming handoff uses
    non-default inits).  branch_metrics: [B, T, 2^m] (float32 / int32).

    Returns (final_metrics [B, S], decisions [T, B, S] int8).
    """
    S = trellis.num_states
    B = branch_metrics.shape[0]
    esym_prev = jnp.asarray(trellis.esym_prev)  # [S, 2]
    dtype = jnp.int32 if hard else jnp.float32

    def step(metrics, bm_t):
        # Predecessor metrics: state ns = i*(S/2)+j has predecessors 2j, 2j+1
        # — the even/odd interleave, identical for both input halves.
        pm = metrics.reshape(B, S // 2, 2)                  # [B, S/2, 2]
        pm = jnp.concatenate([pm, pm], axis=1)              # [B, S, 2]
        bm = bm_t[:, esym_prev].astype(dtype)               # [B, S, 2]
        cand = pm + bm
        if hard:
            cand = jnp.minimum(cand, HARD_METRIC_SAT)
        dec = jnp.argmin(cand, axis=-1).astype(jnp.int8)    # first-wins ties
        new_metrics = jnp.min(cand, axis=-1)
        return new_metrics, dec

    final_metrics, decisions = jax.lax.scan(step, init, jnp.swapaxes(branch_metrics, 0, 1))
    return final_metrics, decisions


def _acs_scan(trellis: Trellis, branch_metrics: jnp.ndarray, hard: bool
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B = branch_metrics.shape[0]
    return acs_forward(trellis, branch_metrics, hard,
                       initial_metrics(trellis, B, hard))


def _traceback(trellis: Trellis, final_metrics: jnp.ndarray,
               decisions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trace from the global-min end state. Returns (bits [B, T], min_metric [B])."""
    prev_state = jnp.asarray(trellis.prev_state)   # [S, 2]
    input_of = jnp.asarray(trellis.input_of)       # [S]
    end_state = jnp.argmin(final_metrics, axis=-1).astype(jnp.int32)  # [B]
    min_metric = jnp.min(final_metrics, axis=-1)

    def tb_step(cur, dec_t):
        b = jnp.take_along_axis(dec_t, cur[:, None], axis=1)[:, 0].astype(jnp.int32)
        bit = input_of[cur]
        prev = prev_state[cur, b]
        return prev, bit

    _, bits = jax.lax.scan(tb_step, end_state, decisions, reverse=True)
    return jnp.swapaxes(bits, 0, 1), min_metric            # [B, T]


def traceback_from(trellis: Trellis, decisions: jnp.ndarray,
                   start_states: jnp.ndarray,
                   start_index=None) -> jnp.ndarray:
    """Traceback from explicit per-frame start states.

    ``decisions``: [T, B, S]; ``start_states``: [B].  If ``start_index`` is
    given ([B] or scalar), steps with t >= start_index are no-ops — used by
    the streaming decoder whose last time-block starts its traceback before
    the (absent) right halo.  Returns bits [B, T] (entries at t >=
    start_index are garbage and must be discarded by the caller).
    """
    T = decisions.shape[0]
    prev_state = jnp.asarray(trellis.prev_state)
    input_of = jnp.asarray(trellis.input_of)
    cur0 = start_states.astype(jnp.int32)

    def tb_step(cur, xs):
        dec_t, t = xs
        b = jnp.take_along_axis(dec_t, cur[:, None], axis=1)[:, 0].astype(jnp.int32)
        bit = input_of[cur]
        prev = prev_state[cur, b]
        if start_index is not None:
            live = t < start_index
            prev = jnp.where(live, prev, cur)
        return prev, bit

    _, bits = jax.lax.scan(tb_step, cur0,
                           (decisions, np.arange(T, dtype=np.int32)),
                           reverse=True)
    return jnp.swapaxes(bits, 0, 1)


def viterbi_decode_soft(code: Code, distances: jnp.ndarray) -> jnp.ndarray:
    """Soft-decision block Viterbi.

    Args:
      distances: ``[B, T, 2^m]`` demapper distance vectors
        (T = block_len + K - 1).
    Returns:
      ``[B, block_len]`` decoded info bits (tail stripped).
    """
    trellis = build_trellis(code)
    final_metrics, decisions = _acs_scan(trellis, distances.astype(jnp.float32), hard=False)
    bits, _ = _traceback(trellis, final_metrics, decisions)
    return bits[:, : code.block_length].astype(jnp.int32)


def viterbi_decode_hard(code: Code, received: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard-decision block Viterbi on received symbols.

    Args:
      received: ``[B, T]`` int symbols (already masked to symlen_out bits).
    Returns:
      (``[B, block_len]`` decoded bits, ``[B]`` winning path metric — the
      extra value the BSC callback carries,
      binary-symmetric-channel/include/decoder.h:9).
    """
    trellis = build_trellis(code)
    bm = hard_branch_metrics(code, received)
    final_metrics, decisions = _acs_scan(trellis, bm, hard=True)
    bits, metric = _traceback(trellis, final_metrics, decisions)
    return bits[:, : code.block_length].astype(jnp.int32), metric
