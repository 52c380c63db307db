"""Fully fused Monte-Carlo chain kernels (flagship configurations).

One Pallas kernel per batch tile runs the complete simulation step in
VMEM/registers: info-bit generation, shift-register encoding, the channel
(Box-Muller AWGN over the on-chip PRNG, or per-coded-bit BSC flips),
demapping (soft squared-distance or snap-then-distance hard), bit-packed
add-compare-select, traceback, and error counting — with the Monte-Carlo
step loop inside the kernel, so the only HBM traffic is per-lane error
counters.  This is the "speed-of-light" configuration of BASELINE.json:
the chains the C reference runs at ~6.6e6 / ~9.4e6 bits/s on a CPU core
(AWGN-channel/main.c:80-144, binary-symmetric-channel/main.c:57-98).

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


def _lowbias32(x: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche hash (lowbias32) — interpret-mode PRNG fallback."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * np.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _interp_bits(shape, base: jnp.ndarray, salt: int) -> jnp.ndarray:
    """Counter-hash uint32 stream for ``interpret=True`` runs: the TPU
    hardware PRNG (pltpu.prng_random_bits) has no CPU interpreter lowering,
    so the multi-chip dryrun drives the fused kernel with this pure-jnp
    generator instead.  Validation-only (kernel structure + sharding); the
    TPU path always uses the hardware PRNG."""
    n = int(np.prod(shape))
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    return _lowbias32(
        _lowbias32(idx * np.uint32(0x9E3779B9) + base)
        ^ np.uint32((salt * 0x85EBCA6B) & 0xFFFFFFFF))


def _interp_uniform(shape, base: jnp.ndarray, salt: int) -> jnp.ndarray:
    bits = _interp_bits(shape, base, salt) >> 1
    return (bits.astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(2.0 ** -31) + jnp.float32(2.0 ** -32))


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """random bits → (0, 1) float32 uniforms, never 0.

    Uses 31 bits so Box-Muller reaches ~6.6 sigma (Q(6.6) ≈ 2e-11, below
    every published BER point) — a 24-bit mantissa would truncate Gaussian
    tails at 5.9 sigma and bias the 12-14 dB curve points.
    prng_random_bits may return *signed* int32; bitcast before shifting so
    the top bit does not turn into a sign."""
    ubits = pltpu.bitcast(bits, jnp.uint32) >> 1          # < 2^31
    ibits = pltpu.bitcast(ubits, jnp.int32)               # positive; Mosaic
    return (ibits.astype(jnp.float32) * jnp.float32(2.0 ** -31)  # lacks u32→f32
            + jnp.float32(2.0 ** -32))


def _mc_kernel(trellis: Trellis, T: int, L: int, Bt: int,
               channel: str = "awgn", demapper: str = "soft",
               interpret: bool = False):
    """Whole-Monte-Carlo-step kernel: bits→encode→channel→metrics→ACS→
    traceback→error counts, nsteps iterations, all resident in VMEM.  The
    only HBM traffic is the per-lane error counters.

    channel "awgn": Box-Muller noise + soft squared-distance metrics (the
    param is sigma); "bsc": independent coded-bit flips + Hamming metrics
    saturated at 0xFF00 (param is the crossover probability) — the hard
    Viterbi chain of binary-symmetric-channel/main.c."""
    code = trellis.code
    S = trellis.num_states
    M = code.points_per_symbol
    K = code.constraint_length
    if S > _UNROLL_STATES:
        raise NotImplementedError("fused MC kernel supports K <= 7")
    _, _, _, _, nwords, _ = _tables(trellis)
    points = get_constellation(code.symlen_out)
    ndist = min_sq_distance(code.symlen_out)
    esym0 = trellis.esym_prev[:, 0]
    esym1 = trellis.esym_prev[:, 1]
    prev0 = trellis.prev_state[:, 0]
    prev1 = trellis.prev_state[:, 1]
    half_mask = (S >> 1) - 1
    polys = [int(p) for p in code.polynomials]
    from convolutional_codes_tpu.models.trellis import quirk_mask_low
    from convolutional_codes_tpu.models.codebook import PARITY_COMPAT
    qmask = quirk_mask_low(K) if code.parity == PARITY_COMPAT else 0

    def parity_u32(x):
        x = x ^ (x >> 16)
        x = x ^ (x >> 8)
        x = x ^ (x >> 4)
        x = x ^ (x >> 2)
        x = x ^ (x >> 1)
        return x & np.uint32(1)

    symlen = code.symlen_out
    hard = channel == "bsc"

    def kernel(seed_ref, sigma_ref, nsteps_ref, err_ref, bits_ref, noise_ref,
               dec_ref, flips_ref):
        if interpret:
            hbase = _lowbias32(
                seed_ref[0].astype(jnp.uint32) * np.uint32(0x9E3779B9)
                ^ (pl.program_id(0).astype(jnp.uint32) + np.uint32(1))
                * np.uint32(0xC2B2AE35))
        else:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        param = sigma_ref[0]
        row_live = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0) < L
        inv_nd = jnp.float32(1.0 / ndist)

        def one_step(step, carry):
            errs, ferrs = carry
            if interpret:
                sbase = hbase + step.astype(jnp.uint32) * np.uint32(0x85EBCA6B)
            # fresh info bits (tail rows forced to zero — encoder.c:112-115)
            if interpret:
                rnd = _interp_bits((T, Bt), sbase, 0)
            else:
                rnd = pltpu.bitcast(pltpu.prng_random_bits((T, Bt)), jnp.uint32)
            bits_ref[:] = jnp.where(row_live, (rnd & 1).astype(jnp.int32), 0)
            if hard:
                # per-coded-bit flip masks packed into a symbol-wide int
                # (binary-symmetric-channel/main.c:61-68)
                if interpret:
                    u = _interp_uniform((symlen, T, Bt), sbase, 1)
                else:
                    u = _uniform_from_bits(
                        pltpu.prng_random_bits((symlen, T, Bt)))
                fmask = jnp.zeros((T, Bt), jnp.uint32)
                for k in range(symlen):
                    fk = (u[k] < param).astype(jnp.uint32)
                    fmask = fmask | (fk << k)
                flips_ref[:] = fmask.astype(jnp.int32)
            else:
                # bulk Box-Muller noise for the whole block
                if interpret:
                    u = _interp_uniform((2, T, Bt), sbase, 2)
                else:
                    u = _uniform_from_bits(pltpu.prng_random_bits((2, T, Bt)))
                r = jnp.sqrt(-2.0 * jnp.log(u[0]))
                theta = jnp.float32(_TWO_PI) * u[1]
                noise_ref[0] = r * jnp.cos(theta)
                noise_ref[1] = r * jnp.sin(theta)

            def fwd(t, fc):
                metrics, reg = fc
                bitrow = bits_ref[t].astype(jnp.uint32)
                reg = (reg >> 1) | (bitrow << (K - 1))
                # encoder parity per polynomial (incl. compat quirk)
                esym = jnp.zeros((Bt,), jnp.uint32)
                for p in polys:
                    x = reg & np.uint32(p)
                    bit = parity_u32(x)
                    if qmask:
                        bit = bit & (np.uint32(1) - parity_u32(x & np.uint32(qmask)))
                    esym = (esym << 1) | bit
                if hard:
                    rx = esym ^ flips_ref[t].astype(jnp.uint32)
                    dists = []
                    for e in range(M):
                        x = rx ^ np.uint32(e)
                        h = x & np.uint32(1)
                        for k in range(1, symlen):
                            h = h + ((x >> k) & np.uint32(1))
                        dists.append(h.astype(jnp.int32).astype(jnp.float32))
                else:
                    txi = jnp.full((Bt,), float(points[0, 0]), jnp.float32)
                    txq = jnp.full((Bt,), float(points[0, 1]), jnp.float32)
                    for e in range(1, M):
                        hit = esym == e
                        txi = jnp.where(hit, float(points[e, 0]), txi)
                        txq = jnp.where(hit, float(points[e, 1]), txq)
                    rxi = txi + param * noise_ref[0, t]
                    rxq = txq + param * noise_ref[1, t]
                    dists = []
                    for e in range(M):
                        di = rxi - float(points[e, 0])
                        dq = rxq - float(points[e, 1])
                        dists.append(((di * di) + (dq * dq)) * inv_nd)
                    if demapper == "hard":
                        # snap-then-distance (hard-demapper.c:66-87): pick
                        # the nearest point (strict less, first wins), then
                        # re-derive the distance vector from the snapped
                        # point — downstream soft ACS runs unchanged
                        best = dists[0]
                        sxi = jnp.full((Bt,), float(points[0, 0]), jnp.float32)
                        sxq = jnp.full((Bt,), float(points[0, 1]), jnp.float32)
                        for e in range(1, M):
                            better = dists[e] < best
                            best = jnp.where(better, dists[e], best)
                            sxi = jnp.where(better, float(points[e, 0]), sxi)
                            sxq = jnp.where(better, float(points[e, 1]), sxq)
                        dists = []
                        for e in range(M):
                            di = sxi - float(points[e, 0])
                            dq = sxq - float(points[e, 1])
                            dists.append(((di * di) + (dq * dq)) * inv_nd)
                b0 = jnp.concatenate([dists[int(e)][None, :] for e in esym0], 0)
                b1 = jnp.concatenate([dists[int(e)][None, :] for e in esym1], 0)
                cand0 = _rows(metrics, prev0) + b0
                cand1 = _rows(metrics, prev1) + b1
                if hard:
                    # saturating 0xFF00 arithmetic (BSC viterbi :127-130)
                    cand0 = jnp.minimum(cand0, float(0xFF00))
                    cand1 = jnp.minimum(cand1, float(0xFF00))
                dec = cand1 < cand0
                metrics = jnp.where(dec, cand1, cand0)
                decu = dec.astype(jnp.uint32)
                for w in range(nwords):
                    lo, hi = w * 32, min(w * 32 + 32, S)
                    acc = decu[lo]
                    for s in range(lo + 1, hi):
                        acc = acc + decu[s] * np.uint32(1 << (s - lo))
                    dec_ref[t, w] = acc.astype(jnp.int32)
                return metrics, reg

            init_val = float(0xFF00) if hard else BIG_METRIC
            init = jnp.full((S, Bt), init_val, jnp.float32)
            init = jnp.concatenate(
                [jnp.zeros((1, Bt), jnp.float32), init[1:]], axis=0)
            metrics, _ = jax.lax.fori_loop(
                0, T, fwd, (init, jnp.zeros((Bt,), jnp.uint32)))

            # in-kernel argmin (strict less → first state wins ties)
            best = metrics[0]
            cur = jnp.zeros((Bt,), jnp.uint32)
            for s in range(1, S):
                better = metrics[s] < best
                best = jnp.where(better, metrics[s], best)
                cur = jnp.where(better, np.uint32(s), cur)

            def tb(i, tc):
                cur, err, fe = tc
                t = T - 1 - i
                if nwords == 1:
                    word = dec_ref[t, 0].astype(jnp.uint32)
                else:
                    widx = (cur >> 5).astype(jnp.uint32)
                    word = dec_ref[t, 0].astype(jnp.uint32)
                    for w in range(1, nwords):
                        word = jnp.where(widx == w,
                                         dec_ref[t, w].astype(jnp.uint32), word)
                b = (word >> (cur & 31)) & 1
                bit = (cur >> (K - 2)).astype(jnp.int32)
                mism = ((bit != bits_ref[t]) & (t < L)).astype(jnp.int32)
                err = err + mism
                fe = fe | mism
                cur = ((cur & half_mask) << 1) | b
                return cur, err, fe

            _, err, fe = jax.lax.fori_loop(
                0, T, tb, (cur, jnp.zeros((Bt,), jnp.int32),
                           jnp.zeros((Bt,), jnp.int32)))
            return errs + err, ferrs + fe

        # dynamic trip count: a large static bound tempts the compiler to
        # unroll (pathological compile times); dynamic also means one
        # executable serves every sample-size tier
        errs, ferrs = jax.lax.fori_loop(
            0, nsteps_ref[0], one_step,
            (jnp.zeros((Bt,), jnp.int32), jnp.zeros((Bt,), jnp.int32)))
        err_ref[0] = errs
        err_ref[1] = ferrs

    return kernel, nwords


def _mc_kernel_bulk(trellis: Trellis, T: int, L: int, Bt: int,
                    channel: str = "awgn", demapper: str = "soft",
                    interpret: bool = False):
    """Bulk-staged variant of :func:`_mc_kernel`: encoder, channel and
    demapper run as full ``[T, Bt]`` array ops BEFORE the trellis loop, so
    the per-symbol fori_loop body shrinks to branch-metric loads + ACS.

    The RNG draw order and every per-element float expression are identical
    to the loop kernel, so for a given (seed, tile) the error counters are
    bit-identical (tested in interpret mode); only the op schedule differs.
    The shift-register recurrence vanishes into K static row-shifted views
    of the bit plane (reg[t] = sum_j bits[t-j] << (K-1-j)) — encoder.c's
    sequential register walk becomes K shifted adds on [T, Bt] planes.
    """
    code = trellis.code
    S = trellis.num_states
    M = code.points_per_symbol
    K = code.constraint_length
    if S > _UNROLL_STATES:
        raise NotImplementedError("fused MC kernel supports K <= 7")
    _, _, _, _, nwords, _ = _tables(trellis)
    points = get_constellation(code.symlen_out)
    ndist = min_sq_distance(code.symlen_out)
    esym0 = trellis.esym_prev[:, 0]
    esym1 = trellis.esym_prev[:, 1]
    prev0 = trellis.prev_state[:, 0]
    prev1 = trellis.prev_state[:, 1]
    half_mask = (S >> 1) - 1
    polys = [int(p) for p in code.polynomials]
    from convolutional_codes_tpu.models.trellis import quirk_mask_low
    from convolutional_codes_tpu.models.codebook import PARITY_COMPAT
    qmask = quirk_mask_low(K) if code.parity == PARITY_COMPAT else 0

    def parity_u32(x):
        x = x ^ (x >> 16)
        x = x ^ (x >> 8)
        x = x ^ (x >> 4)
        x = x ^ (x >> 2)
        x = x ^ (x >> 1)
        return x & np.uint32(1)

    symlen = code.symlen_out
    hard = channel == "bsc"

    def kernel(seed_ref, sigma_ref, nsteps_ref, err_ref, bits_ref, noise_ref,
               dec_ref, flips_ref, dists_ref):
        if interpret:
            hbase = _lowbias32(
                seed_ref[0].astype(jnp.uint32) * np.uint32(0x9E3779B9)
                ^ (pl.program_id(0).astype(jnp.uint32) + np.uint32(1))
                * np.uint32(0xC2B2AE35))
        else:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        param = sigma_ref[0]
        row_live = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0) < L
        inv_nd = jnp.float32(1.0 / ndist)
        zrow = jnp.zeros((1, Bt), jnp.uint32)

        def one_step(step, carry):
            errs, ferrs = carry
            if interpret:
                sbase = hbase + step.astype(jnp.uint32) * np.uint32(0x85EBCA6B)
            # fresh info bits (tail rows forced to zero — encoder.c:112-115)
            if interpret:
                rnd = _interp_bits((T, Bt), sbase, 0)
            else:
                rnd = pltpu.bitcast(pltpu.prng_random_bits((T, Bt)), jnp.uint32)
            bits_ref[:] = jnp.where(row_live, (rnd & 1).astype(jnp.int32), 0)

            # ---- bulk encode: register plane from K shifted bit views ----
            bplane = bits_ref[:].astype(jnp.uint32)
            reg = bplane << (K - 1)
            for j in range(1, K):
                shifted = jnp.concatenate(
                    [jnp.broadcast_to(zrow, (j, Bt)), bplane[:T - j]], axis=0)
                reg = reg | (shifted << (K - 1 - j))
            esym = jnp.zeros((T, Bt), jnp.uint32)
            for p in polys:
                x = reg & np.uint32(p)
                bit = parity_u32(x)
                if qmask:
                    bit = bit & (np.uint32(1) - parity_u32(x & np.uint32(qmask)))
                esym = (esym << 1) | bit

            # ---- bulk channel + demap into the [M, T, Bt] metric plane ----
            if hard:
                if interpret:
                    u = _interp_uniform((symlen, T, Bt), sbase, 1)
                else:
                    u = _uniform_from_bits(
                        pltpu.prng_random_bits((symlen, T, Bt)))
                fmask = jnp.zeros((T, Bt), jnp.uint32)
                for k in range(symlen):
                    fk = (u[k] < param).astype(jnp.uint32)
                    fmask = fmask | (fk << k)
                rx = esym ^ fmask
                for e in range(M):
                    x = rx ^ np.uint32(e)
                    h = x & np.uint32(1)
                    for k in range(1, symlen):
                        h = h + ((x >> k) & np.uint32(1))
                    dists_ref[e] = h.astype(jnp.int32).astype(jnp.float32)
            else:
                if interpret:
                    u = _interp_uniform((2, T, Bt), sbase, 2)
                else:
                    u = _uniform_from_bits(pltpu.prng_random_bits((2, T, Bt)))
                r = jnp.sqrt(-2.0 * jnp.log(u[0]))
                theta = jnp.float32(_TWO_PI) * u[1]
                txi = jnp.full((T, Bt), float(points[0, 0]), jnp.float32)
                txq = jnp.full((T, Bt), float(points[0, 1]), jnp.float32)
                for e in range(1, M):
                    hit = esym == e
                    txi = jnp.where(hit, float(points[e, 0]), txi)
                    txq = jnp.where(hit, float(points[e, 1]), txq)
                rxi = txi + param * (r * jnp.cos(theta))
                rxq = txq + param * (r * jnp.sin(theta))
                if demapper == "hard":
                    # snap-then-distance (hard-demapper.c:66-87), bulk
                    d0 = []
                    for e in range(M):
                        di = rxi - float(points[e, 0])
                        dq = rxq - float(points[e, 1])
                        d0.append(((di * di) + (dq * dq)) * inv_nd)
                    best = d0[0]
                    sxi = jnp.full((T, Bt), float(points[0, 0]), jnp.float32)
                    sxq = jnp.full((T, Bt), float(points[0, 1]), jnp.float32)
                    for e in range(1, M):
                        better = d0[e] < best
                        best = jnp.where(better, d0[e], best)
                        sxi = jnp.where(better, float(points[e, 0]), sxi)
                        sxq = jnp.where(better, float(points[e, 1]), sxq)
                    rxi, rxq = sxi, sxq
                for e in range(M):
                    di = rxi - float(points[e, 0])
                    dq = rxq - float(points[e, 1])
                    dists_ref[e] = ((di * di) + (dq * dq)) * inv_nd

            # ---- trellis loop: loads + ACS only ----
            def fwd(t, metrics):
                dists = [dists_ref[e, t] for e in range(M)]
                b0 = jnp.concatenate(
                    [dists[int(e)][None, :] for e in esym0], 0)
                b1 = jnp.concatenate(
                    [dists[int(e)][None, :] for e in esym1], 0)
                cand0 = _rows(metrics, prev0) + b0
                cand1 = _rows(metrics, prev1) + b1
                if hard:
                    cand0 = jnp.minimum(cand0, float(0xFF00))
                    cand1 = jnp.minimum(cand1, float(0xFF00))
                dec = cand1 < cand0
                metrics = jnp.where(dec, cand1, cand0)
                decu = dec.astype(jnp.uint32)
                for w in range(nwords):
                    lo, hi = w * 32, min(w * 32 + 32, S)
                    acc = decu[lo]
                    for s in range(lo + 1, hi):
                        acc = acc + decu[s] * np.uint32(1 << (s - lo))
                    dec_ref[t, w] = acc.astype(jnp.int32)
                return metrics

            init_val = float(0xFF00) if hard else BIG_METRIC
            init = jnp.full((S, Bt), init_val, jnp.float32)
            init = jnp.concatenate(
                [jnp.zeros((1, Bt), jnp.float32), init[1:]], axis=0)
            metrics = jax.lax.fori_loop(0, T, fwd, init)

            # in-kernel argmin (strict less → first state wins ties)
            best = metrics[0]
            cur = jnp.zeros((Bt,), jnp.uint32)
            for s in range(1, S):
                better = metrics[s] < best
                best = jnp.where(better, metrics[s], best)
                cur = jnp.where(better, np.uint32(s), cur)

            def tb(i, tc):
                cur, err, fe = tc
                t = T - 1 - i
                if nwords == 1:
                    word = dec_ref[t, 0].astype(jnp.uint32)
                else:
                    widx = (cur >> 5).astype(jnp.uint32)
                    word = dec_ref[t, 0].astype(jnp.uint32)
                    for w in range(1, nwords):
                        word = jnp.where(widx == w,
                                         dec_ref[t, w].astype(jnp.uint32), word)
                b = (word >> (cur & 31)) & 1
                bit = (cur >> (K - 2)).astype(jnp.int32)
                mism = ((bit != bits_ref[t]) & (t < L)).astype(jnp.int32)
                err = err + mism
                fe = fe | mism
                cur = ((cur & half_mask) << 1) | b
                return cur, err, fe

            _, err, fe = jax.lax.fori_loop(
                0, T, tb, (cur, jnp.zeros((Bt,), jnp.int32),
                           jnp.zeros((Bt,), jnp.int32)))
            return errs + err, ferrs + fe

        errs, ferrs = jax.lax.fori_loop(
            0, nsteps_ref[0], one_step,
            (jnp.zeros((Bt,), jnp.int32), jnp.zeros((Bt,), jnp.int32)))
        err_ref[0] = errs
        err_ref[1] = ferrs

    return kernel, nwords


def mc_chain_viterbi(code: Code, batch: int, nsteps: int, seed, param,
                     channel: str = "awgn", block_lanes: int = 1024,
                     interpret: bool = False, demapper: str = "soft",
                     bulk_stages: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``nsteps`` whole Monte-Carlo steps of the Viterbi chain entirely
    on-chip.  ``channel``: "awgn" (param = sigma, soft decode) or "bsc"
    (param = crossover probability, hard decode with saturating metrics).
    Returns per-lane (bit_errors [B], frame_errors [B]) int32 counters;
    total simulated info bits = batch * nsteps * block_len.
    """
    trellis = build_trellis(code)
    T, L = code.num_block_symbols, code.block_length
    M = code.points_per_symbol
    Bt = min(block_lanes, batch)
    if batch % Bt:
        raise ValueError(f"batch {batch} not divisible by tile {Bt}")
    nwords = (trellis.num_states + 31) // 32
    scratch = [
        pltpu.VMEM((T, Bt), jnp.int32),              # info bits
        pltpu.VMEM((2, T, Bt), jnp.float32),         # I/Q noise
        pltpu.VMEM((T, nwords, Bt), jnp.int32),      # packed decisions
        pltpu.VMEM((T, Bt), jnp.int32),              # BSC flip masks
    ]
    if bulk_stages:
        kernel, _ = _mc_kernel_bulk(trellis, T, L, Bt, channel, demapper,
                                    interpret=interpret)
        scratch.append(pltpu.VMEM((M, T, Bt), jnp.float32))  # metric planes
    else:
        kernel, _ = _mc_kernel(trellis, T, L, Bt, channel, demapper,
                               interpret=interpret)
    errs = pl.pallas_call(
        kernel,
        grid=(batch // Bt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, batch), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32) if np.ndim(seed) == 0 else seed,
      jnp.asarray([param], jnp.float32) if np.ndim(param) == 0 else param,
      jnp.asarray([nsteps], jnp.int32))
    return errs[0], errs[1]


def mc_awgn_viterbi(code: Code, batch: int, nsteps: int, seed, sigma,
                    block_lanes: int = 1024, interpret: bool = False):
    return mc_chain_viterbi(code, batch, nsteps, seed, sigma, "awgn",
                            block_lanes, interpret)


def mc_bsc_viterbi(code: Code, batch: int, nsteps: int, seed, crossover,
                   block_lanes: int = 1024, interpret: bool = False):
    return mc_chain_viterbi(code, batch, nsteps, seed, crossover, "bsc",
                            block_lanes, interpret)
