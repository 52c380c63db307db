"""Fully fused AWGN soft-Viterbi chain kernel (flagship Monte-Carlo path).

One Pallas kernel per batch tile runs, per trellis step, entirely in
VMEM/registers:
  on-chip PRNG (Box-Muller over pltpu.prng_random_bits) → AWGN on the
  mapped constellation point → squared-distance soft demapping → ACS with
  bit-packed survivor decisions.

HBM traffic shrinks to the encoded symbol stream in (4 B/frame-step) and
packed decisions out (4 B/frame-step) — the [B, T, 2] noisy IQ and
[B, T, 2^m] distance tensors of the modular path never exist.  This is the
"speed-of-light" configuration of BASELINE.json: the chain the C reference
runs at ~6.6e6 bits/s on a CPU core (AWGN-channel/main.c:80-144).

RNG note: the channel noise uses the TPU-native PRNG
(distribution-level equivalence with the reference's Box-Muller over libc
rand — SURVEY.md §2e; the modular path uses threefry).  Each (tile, step)
seeds independently from a user seed, so results are reproducible for a
fixed seed/batch split but differ from the modular path's streams.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.models.constellations import get_constellation, min_sq_distance
from convolutional_codes_tpu.models.trellis import Trellis, build_trellis
from convolutional_codes_tpu.ops.viterbi_pallas import (
    BIG_METRIC, _rows, _tables, _UNROLL_STATES)

_TWO_PI = 2.0 * math.pi


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """random bits → (0, 1] float32 uniforms (24-bit mantissa, never 0).

    prng_random_bits may return *signed* int32; bitcast before shifting so
    the top bit does not turn into a sign."""
    ubits = pltpu.bitcast(bits, jnp.uint32)
    return ((ubits >> 8).astype(jnp.float32) * jnp.float32(2.0 ** -24)
            + jnp.float32(2.0 ** -25))


def _fused_kernel(trellis: Trellis, T: int, Bt: int):
    code = trellis.code
    S = trellis.num_states
    M = code.points_per_symbol
    if S > _UNROLL_STATES:
        raise NotImplementedError("fused chain kernel supports K <= 7")
    _, _, _, _, nwords, _ = _tables(trellis)
    points = get_constellation(code.symlen_out)          # [M, 2] float32 host
    ndist = min_sq_distance(code.symlen_out)
    esym0 = trellis.esym_prev[:, 0]
    esym1 = trellis.esym_prev[:, 1]
    prev0 = trellis.prev_state[:, 0]
    prev1 = trellis.prev_state[:, 1]

    def kernel(seed_ref, sigma_ref, syms_ref, init_ref, fm_ref, dec_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        sigma = sigma_ref[0]

        def body(t, metrics):
            sym = syms_ref[t]                            # [Bt] int32
            # transmitted constellation point via static where-chain
            txi = jnp.full(sym.shape, float(points[0, 0]), jnp.float32)
            txq = jnp.full(sym.shape, float(points[0, 1]), jnp.float32)
            for e in range(1, M):
                hit = sym == e
                txi = jnp.where(hit, float(points[e, 0]), txi)
                txq = jnp.where(hit, float(points[e, 1]), txq)
            # Box-Muller AWGN (gaussian.c:18-38 semantics, TPU PRNG);
            # random_bits needs rank >= 2 — draw both uniforms in one call
            u = _uniform_from_bits(pltpu.prng_random_bits((2,) + sym.shape))
            u1, u2 = u[0], u[1]
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            theta = jnp.float32(_TWO_PI) * u2
            rxi = txi + sigma * r * jnp.cos(theta)
            rxq = txq + sigma * r * jnp.sin(theta)
            # soft demap: normalized squared distance to each point
            dists = []
            inv_nd = jnp.float32(1.0 / ndist)
            for e in range(M):
                di = rxi - float(points[e, 0])
                dq = rxq - float(points[e, 1])
                dists.append(((di * di) + (dq * dq)) * inv_nd)
            # ACS
            b0 = jnp.concatenate([dists[int(e)][None, :] for e in esym0], axis=0)
            b1 = jnp.concatenate([dists[int(e)][None, :] for e in esym1], axis=0)
            cand0 = _rows(metrics, prev0) + b0
            cand1 = _rows(metrics, prev1) + b1
            dec = cand1 < cand0
            new_metrics = jnp.where(dec, cand1, cand0)
            decu = dec.astype(jnp.uint32)
            for w in range(nwords):
                lo, hi = w * 32, min(w * 32 + 32, S)
                acc = decu[lo]
                for s in range(lo + 1, hi):
                    acc = acc + decu[s] * np.uint32(1 << (s - lo))
                dec_ref[t, w] = acc.astype(jnp.int32)
            return new_metrics

        metrics = jax.lax.fori_loop(0, T, body, init_ref[:])
        fm_ref[:] = metrics

    return kernel, nwords


def fused_awgn_acs(code: Code, syms_tb: jnp.ndarray, seed, sigma,
                   block_lanes: int = 1024, interpret: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused noise+demap+ACS kernel.

    Args:
      syms_tb: [T, B] int32 encoded symbols (time-major).
      seed: int32 scalar PRNG seed for the channel noise.
      sigma: per-component noise std dev.
    Returns:
      (final_metrics [S, B] f32, decisions [T, nwords, B] int32).
    """
    trellis = build_trellis(code)
    T, B = syms_tb.shape
    S = trellis.num_states
    Bt = min(block_lanes, B)
    if B % Bt:
        raise ValueError(f"batch {B} not divisible by tile {Bt}")
    kernel, nwords = _fused_kernel(trellis, T, Bt)
    init = jnp.full((S, B), BIG_METRIC, jnp.float32).at[0, :].set(0.0)

    fm, dec = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # seed
            pl.BlockSpec(memory_space=pltpu.SMEM),       # sigma
            pl.BlockSpec((T, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
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
    )(jnp.asarray([seed], jnp.int32) if np.ndim(seed) == 0 else seed,
      jnp.asarray([sigma], jnp.float32) if np.ndim(sigma) == 0 else sigma,
      syms_tb.astype(jnp.int32), init)
    return fm, dec
