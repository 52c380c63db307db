"""Pallas TPU kernels for the Viterbi hot loop.

The XLA scan keeps each [S, B] intermediate in HBM (one round trip per
elementwise op per trellis step).  These kernels run the whole forward
recursion for a batch tile inside VMEM: path metrics live on-chip across
all T steps, the only HBM traffic is the distance stream in (streamed per
tile) and the bit-packed decisions out (4 bytes per frame-step).

Design notes:
  * trellis selection as one-hot matmuls: predecessor metrics are
    ``P_b @ metrics`` and branch metrics ``E_b @ bm`` with static 0/1
    matrices — exact (each row selects one element) and MXU-friendly.
  * soft and hard share one f32 kernel: hard Hamming metrics and the
    0xFF00 saturation are exact in f32 (all values < 2^24); +inf initial
    metrics are replaced by a finite 1e30 whose absorbing behavior under
    f32 addition reproduces the reference's INF comparisons bit-for-bit
    (any real branch metric is below the 1e22 ulp).
  * decisions are bit-packed along states into int32 words in-kernel
    (sum of distinct powers of two over sublane groups).
  * traceback is a second tiny kernel: per-lane variable shifts extract
    survivor bits — no gathers, 4 bytes read per frame-step.

Reference behavior being accelerated: AWGN-channel/viterbi-decoder.c
receive_symbol/traceback (and the BSC variant) — same semantics as
ops.viterbi, which remains the portable XLA path (and the CPU fallback).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convolutional_codes_tpu.models.trellis import Trellis

#: Finite stand-in for +inf path metrics (absorbing under f32 adds).
BIG_METRIC = 1e30

_LANES = 128


#: Below this state count, trellis row selection is unrolled concatenation
#: (MXU matmuls on heavily padded tiny matrices would waste the array).
_UNROLL_STATES = 64

#: Kernel ceiling: one-hot matmul selection scales to 256 states (K <= 9,
#: e.g. the K=9 stack-era Viterbi config); beyond that the [S, S] one-hot
#: tables and the unrolled bit-packing stop paying for themselves — the
#: XLA scan path takes over.
_PALLAS_MAX_STATES = 256


def _tables(trellis: Trellis):
    S = trellis.num_states
    M = trellis.code.points_per_symbol
    P0 = np.zeros((S, S), np.float32)
    P1 = np.zeros((S, S), np.float32)
    E0 = np.zeros((S, M), np.float32)
    E1 = np.zeros((S, M), np.float32)
    ns = np.arange(S)
    P0[ns, trellis.prev_state[:, 0]] = 1.0
    P1[ns, trellis.prev_state[:, 1]] = 1.0
    E0[ns, trellis.esym_prev[:, 0]] = 1.0
    E1[ns, trellis.esym_prev[:, 1]] = 1.0
    nwords = (S + 31) // 32
    weight = (np.uint32(1) << (np.arange(S, dtype=np.uint32) % np.uint32(32)))
    return P0, P1, E0, E1, nwords, weight


def _rows(x, idx):
    """Static row selection [len(idx), lanes] via unrolled concat (no gather)."""
    return jnp.concatenate([x[int(i)][None, :] for i in idx], axis=0)


#: At or above this state count, trellis selection runs as MXU matmuls with
#: one-hot matrices passed as kernel inputs (below it, unrolled row concat
#: on the VPU wins — tiny matmuls waste the padded 128x128 array).
_MATMUL_STATES = 32


def _acs_kernel(trellis: Trellis, T: int, Bt: int, hard: bool):
    _, _, _, _, nwords, _ = _tables(trellis)
    S = trellis.num_states
    if S > _PALLAS_MAX_STATES:
        raise NotImplementedError(
            f"pallas ACS kernel supports up to {_PALLAS_MAX_STATES} states "
            f"(K <= 9); got {S} — use the XLA path")
    use_matmul = S >= _MATMUL_STATES
    prev0 = trellis.prev_state[:, 0]
    prev1 = trellis.prev_state[:, 1]
    esym0 = trellis.esym_prev[:, 0]
    esym1 = trellis.esym_prev[:, 1]

    def pack(dec_ref, t, dec):
        decu = dec.astype(jnp.uint32)
        for w in range(nwords):
            lo = w * 32
            hi = min(lo + 32, S)
            acc = decu[lo]
            for s in range(lo + 1, hi):
                acc = acc + decu[s] * np.uint32(1 << (s - lo))
            dec_ref[t, w] = acc.astype(jnp.int32)

    def finish(cand0, cand1, dec_ref, t):
        if hard:
            cand0 = jnp.minimum(cand0, float(0xFF00))
            cand1 = jnp.minimum(cand1, float(0xFF00))
        dec = cand1 < cand0                                 # ties → branch 0
        new_metrics = jnp.where(dec, cand1, cand0)
        pack(dec_ref, t, dec)
        return new_metrics

    if use_matmul:
        # one-hot selection on the MXU; P/E matrices arrive as inputs
        # (pallas rejects array-valued closure constants)
        # NOTE: precision=HIGHEST is required — the default MXU f32 path
        # truncates inputs to bf16, which corrupts grown path metrics on
        # long frames; HIGHEST's bf16x3 decomposition makes one-hot
        # selection exact (24-bit mantissa = 3 exact bf16 splits).
        HI = jax.lax.Precision.HIGHEST

        def kernel(dists_ref, init_ref, p0_ref, p1_ref, e0_ref, e1_ref,
                   fm_ref, dec_ref):
            def body(t, metrics):
                bm = dists_ref[t]                           # [M, Bt]
                cand0 = jnp.dot(p0_ref[:], metrics, precision=HI,
                                preferred_element_type=jnp.float32) \
                    + jnp.dot(e0_ref[:], bm, precision=HI,
                              preferred_element_type=jnp.float32)
                cand1 = jnp.dot(p1_ref[:], metrics, precision=HI,
                                preferred_element_type=jnp.float32) \
                    + jnp.dot(e1_ref[:], bm, precision=HI,
                              preferred_element_type=jnp.float32)
                return finish(cand0, cand1, dec_ref, t)

            metrics = jax.lax.fori_loop(0, T, body, init_ref[:])
            fm_ref[:] = metrics
    else:
        def kernel(dists_ref, init_ref, fm_ref, dec_ref):
            def body(t, metrics):
                bm = dists_ref[t]                           # [M, Bt]
                cand0 = _rows(metrics, prev0) + _rows(bm, esym0)
                cand1 = _rows(metrics, prev1) + _rows(bm, esym1)
                return finish(cand0, cand1, dec_ref, t)

            metrics = jax.lax.fori_loop(0, T, body, init_ref[:])
            fm_ref[:] = metrics

    return kernel, nwords, use_matmul


def acs_forward_pallas(trellis: Trellis, dists_tmb: jnp.ndarray,
                       init_sb: jnp.ndarray, hard: bool,
                       block_lanes: int = 1024, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward ACS over a [T, M, B] distance stream (state-major layout).

    Args:
      dists_tmb: [T, M, B] float32 branch-metric stream.
      init_sb:   [S, B] float32 initial metrics (use BIG_METRIC, not inf).
    Returns:
      (final_metrics [S, B] f32, decisions [T, nwords, B] int32).
    """
    T, M, B = dists_tmb.shape
    S = trellis.num_states
    Bt = min(block_lanes, B)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    kernel, nwords, use_matmul = _acs_kernel(trellis, T, Bt, hard)

    in_specs = [
        pl.BlockSpec((T, M, Bt), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    operands = [dists_tmb.astype(jnp.float32), init_sb.astype(jnp.float32)]
    if use_matmul:
        P0, P1, E0, E1, _, _ = _tables(trellis)
        for tab in (P0, P1, E0, E1):
            in_specs.append(pl.BlockSpec(
                tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
            operands.append(jnp.asarray(tab))

    fm, dec = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((S, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, nwords, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.float32),
            jax.ShapeDtypeStruct((T, nwords, B), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    return fm, dec


def _traceback_kernel(trellis: Trellis, T: int, nwords: int):
    S = trellis.num_states
    K = trellis.code.constraint_length
    half_mask = (S >> 1) - 1

    def kernel(dec_ref, start_ref, bits_ref):
        def body(i, cur):
            t = T - 1 - i
            if nwords == 1:
                word = dec_ref[t, 0].astype(jnp.uint32)
            else:
                idx = (cur >> 5).astype(jnp.uint32)
                word = dec_ref[t, 0].astype(jnp.uint32)
                for w in range(1, nwords):
                    word = jnp.where(idx == w,
                                     dec_ref[t, w].astype(jnp.uint32), word)
            b = (word >> (cur & 31)) & 1
            bits_ref[t] = (cur >> (K - 2)).astype(jnp.int32)
            return ((cur & half_mask) << 1) | b

        jax.lax.fori_loop(0, T, body, start_ref[0].astype(jnp.uint32))

    return kernel


def traceback_pallas(trellis: Trellis, decisions: jnp.ndarray,
                     start_states: jnp.ndarray, block_lanes: int = 1024,
                     interpret: bool = False) -> jnp.ndarray:
    """Gather-free traceback. decisions [T, nwords, B], start [B] → bits [T, B]."""
    T, nwords, B = decisions.shape
    Bt = min(block_lanes, B)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    kernel = _traceback_kernel(trellis, T, nwords)
    bits = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((T, nwords, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B), jnp.int32),
        interpret=interpret,
    )(decisions, start_states.reshape(1, -1).astype(jnp.int32))
    return bits
