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

Two schedules share one set of stage/ACS helpers (every per-element float
expression and the RNG draw order are identical, so their error counters
are bit-identical — pinned by tests/test_fused_bulk.py):

  * `_mc_kernel` (default): per-symbol loop does encode+channel+demap+ACS.
  * `_mc_kernel_bulk` (opt-in `bulk_stages=True`): encoder/channel/demap
    hoisted to whole-[T, Bt] plane ops before the trellis loop — the
    shift-register recurrence becomes K static row-shifted views of the
    bit plane; the loop body shrinks to metric loads + ACS.

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

#: trellis/traceback loop unroll inside the fused kernels: amortizes the
#: per-iteration loop/guard overhead (~10 of ~150 lane-ops per symbol,
#: PERF.md §1) and gives Mosaic a longer window to pipeline.  Mosaic's
#: fori lowering only supports unroll=1 or full unroll, so this is a
#: manual body-duplication factor (must divide every T it is used with
#: — block T values are even; guarded below).
_TRELLIS_UNROLL = 6


def _fori_unrolled(T, body, init, unroll):
    if unroll <= 1 or T % unroll:
        return jax.lax.fori_loop(0, T, body, init)

    def blk(i, c):
        for j in range(unroll):
            c = body(i * unroll + j, c)
        return c

    return jax.lax.fori_loop(0, T // unroll, blk, init)

#: Fused-kernel state ceiling: above _UNROLL_STATES (64) trellis selection
#: switches to one-hot MXU matmuls with the P/E tables as kernel inputs
#: (same scheme as ops/viterbi_pallas.py), scaling the fused chain to
#: S = 256 (K <= 9).
_FUSED_MAX_STATES = 256


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


def _parity_u32(x: jnp.ndarray) -> jnp.ndarray:
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & np.uint32(1)


def _rand_u32(shape, interpret, sbase, salt):
    if interpret:
        return _interp_bits(shape, sbase, salt)
    return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)


def _rand_uniform(shape, interpret, sbase, salt):
    if interpret:
        return _interp_uniform(shape, sbase, salt)
    return _uniform_from_bits(pltpu.prng_random_bits(shape))


def _stage_fns(code, fast_demap: bool = False):
    """Elementwise stage helpers shared by both kernel schedules: they work
    unchanged on ``(Bt,)`` rows (loop kernel) and ``(T, Bt)`` planes (bulk
    kernel) — same expressions, so same float results.  Takes a bare
    :class:`Code` (no dense trellis — the big-K sequential codes like WSPR
    K=32 have no enumerable state table).

    ``fast_demap`` replaces the squared-distance vector with its expanded
    linear form d'_e = (|p_e|^2 - 2<rx, p_e>) * inv_nd — the |rx|^2 term
    (and, for constant-modulus constellations, the |p_e|^2 term) is common
    to every e at a time step, so dropping it shifts all path metrics at
    that step by the same amount and the ACS compares/argmin are
    mathematically unchanged.  Float rounding differs from the reference
    expression (demapper.c:61-85), so this is a *statistical-contract*
    variant (BER validated by z-test, tests/test_fused_variants.py), not
    the bit-exact default."""
    M = code.points_per_symbol
    symlen = code.symlen_out
    points = get_constellation(symlen)
    polys = [int(p) for p in code.polynomials]
    from convolutional_codes_tpu.models.trellis import quirk_mask_low
    from convolutional_codes_tpu.models.codebook import PARITY_COMPAT
    K = code.constraint_length
    qmask = quirk_mask_low(K) if code.parity == PARITY_COMPAT else 0
    inv_nd = float(1.0 / min_sq_distance(symlen))  # python float:
    # a jnp scalar here would be a captured constant, which pallas rejects

    def esym_of(reg):
        """encoder parity per polynomial (incl. compat quirk)."""
        esym = jnp.zeros(reg.shape, jnp.uint32)
        for p in polys:
            x = reg & np.uint32(p)
            bit = _parity_u32(x)
            if qmask:
                bit = bit & (np.uint32(1) - _parity_u32(x & np.uint32(qmask)))
            esym = (esym << 1) | bit
        return esym

    def hard_dists(rx):
        """Hamming distance vector to every expected symbol."""
        out = []
        for e in range(M):
            x = rx ^ np.uint32(e)
            h = x & np.uint32(1)
            for k in range(1, symlen):
                h = h + ((x >> k) & np.uint32(1))
            out.append(h.astype(jnp.int32).astype(jnp.float32))
        return out

    def tx_select(esym):
        """symbol index → (I, Q) via a static where-chain (mapper.c:54-71)."""
        txi = jnp.full(esym.shape, float(points[0, 0]), jnp.float32)
        txq = jnp.full(esym.shape, float(points[0, 1]), jnp.float32)
        for e in range(1, M):
            hit = esym == e
            txi = jnp.where(hit, float(points[e, 0]), txi)
            txq = jnp.where(hit, float(points[e, 1]), txq)
        return txi, txq

    def dist_vec(rxi, rxq):
        """normalized squared-distance vector (demapper.c:61-85)."""
        out = []
        for e in range(M):
            di = rxi - float(points[e, 0])
            dq = rxq - float(points[e, 1])
            out.append(((di * di) + (dq * dq)) * jnp.float32(inv_nd))
        return out

    pe2 = [float((points[e, 0] ** 2 + points[e, 1] ** 2) * inv_nd)
           for e in range(M)]
    const_mod = len({round(x, 12) for x in pe2}) == 1

    def dist_vec_lin(rxi, rxq):
        """linear-form distance vector (``fast_demap``): hand-CSE'd over
        the unique |coordinate| values so QPSK costs 2 muls + 4 add/negs
        instead of M*(2 subs + 2 muls + 2 adds + mul)."""
        pre_i = {a: rxi * jnp.float32(-2.0 * inv_nd * a)
                 for a in {abs(float(points[e, 0])) for e in range(M)} if a}
        pre_q = {a: rxq * jnp.float32(-2.0 * inv_nd * a)
                 for a in {abs(float(points[e, 1])) for e in range(M)} if a}
        memo = {}

        def lin(pi, pq):
            key = (pi, pq)
            if key in memo:
                return memo[key]
            if (-pi, -pq) in memo:
                v = -memo[(-pi, -pq)]
            elif pi == 0.0:
                v = pre_q[abs(pq)] if pq > 0 else -pre_q[abs(pq)]
            elif pq == 0.0:
                v = pre_i[abs(pi)] if pi > 0 else -pre_i[abs(pi)]
            else:
                ti = pre_i[abs(pi)]
                tq = pre_q[abs(pq)]
                if pi > 0:
                    v = ti + tq if pq > 0 else ti - tq
                else:
                    v = tq - ti if pq > 0 else -(ti + tq)
            memo[key] = v
            return v

        out = []
        for e in range(M):
            v = lin(float(points[e, 0]), float(points[e, 1]))
            out.append(v if const_mod else v + jnp.float32(pe2[e]))
        return out

    if fast_demap:
        dist_vec = dist_vec_lin

    def snap(dists):
        """snap-then-distance (hard-demapper.c:66-87): pick the nearest
        point (strict less, first wins) and return its coordinates —
        downstream soft ACS runs unchanged on the re-derived vector."""
        best = dists[0]
        sxi = jnp.full(best.shape, float(points[0, 0]), jnp.float32)
        sxq = jnp.full(best.shape, float(points[0, 1]), jnp.float32)
        for e in range(1, M):
            better = dists[e] < best
            best = jnp.where(better, dists[e], best)
            sxi = jnp.where(better, float(points[e, 0]), sxi)
            sxq = jnp.where(better, float(points[e, 1]), sxq)
        return sxi, sxq

    return esym_of, hard_dists, tx_select, dist_vec, snap


def _acs_fns(trellis: Trellis, T: int, L: int, Bt: int, hard: bool,
             matmul: bool = False, acs_dtype=jnp.float32):
    """ACS step, metric init, end-state argmin, and the traceback/error
    loop — the trellis half shared verbatim by both kernel schedules.

    ``matmul`` selects one-hot MXU selection (S > _UNROLL_STATES; the
    P/E tables arrive as kernel inputs, threaded through ``acs_step``'s
    ``tables`` argument — pallas rejects array-valued closure constants).
    Exactness: each one-hot f32 row selects a single element, and
    precision=HIGHEST (bf16x3) reproduces the 24-bit mantissa exactly —
    same argument as ops/viterbi_pallas.py.

    ``acs_dtype`` runs the metric arithmetic (branch adds, compares,
    selects, argmin) in the given dtype — bfloat16 halves the vregs per
    metric row (statistical-contract variant; non-matmul path only).
    MEASURED CLOSED on real hardware: Mosaic rejects bf16 vector
    compares on v5e ("Target does not support this comparison", round-5
    minimal-kernel probe) — the bf16 path runs in interpret mode only
    and exists to document the closed lever (PERF.md §1)."""
    S = trellis.num_states
    K = trellis.code.constraint_length
    _, _, _, _, nwords, _ = _tables(trellis)
    esym0 = trellis.esym_prev[:, 0]
    esym1 = trellis.esym_prev[:, 1]
    prev0 = trellis.prev_state[:, 0]
    prev1 = trellis.prev_state[:, 1]
    half_mask = (S >> 1) - 1

    def _finish(cand0, cand1, dec_ref, t):
        """compare-select + packed decision store (ties → branch 0,
        strict-less — do not 'simplify' to argmin, CLAUDE.md)."""
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
        return metrics

    if matmul:
        HI = jax.lax.Precision.HIGHEST

        def acs_step(metrics, dists, dec_ref, t, tables):
            p0, p1, e0, e1 = tables
            bm = jnp.concatenate([d[None, :] for d in dists], 0)  # [M, Bt]
            cand0 = jnp.dot(p0[:], metrics, precision=HI,
                            preferred_element_type=jnp.float32) \
                + jnp.dot(e0[:], bm, precision=HI,
                          preferred_element_type=jnp.float32)
            cand1 = jnp.dot(p1[:], metrics, precision=HI,
                            preferred_element_type=jnp.float32) \
                + jnp.dot(e1[:], bm, precision=HI,
                          preferred_element_type=jnp.float32)
            return _finish(cand0, cand1, dec_ref, t)
    else:
        def acs_step(metrics, dists, dec_ref, t, tables=None):
            """branch select via unrolled static row concat (VPU)."""
            if acs_dtype != jnp.float32:
                dists = [d.astype(acs_dtype) for d in dists]
            b0 = jnp.concatenate([dists[int(e)][None, :] for e in esym0], 0)
            b1 = jnp.concatenate([dists[int(e)][None, :] for e in esym1], 0)
            cand0 = _rows(metrics, prev0) + b0
            cand1 = _rows(metrics, prev1) + b1
            return _finish(cand0, cand1, dec_ref, t)

    def init_metrics():
        init_val = float(0xFF00) if hard else BIG_METRIC
        init = jnp.full((S, Bt), init_val, acs_dtype)
        return jnp.concatenate(
            [jnp.zeros((1, Bt), acs_dtype), init[1:]], axis=0)

    def argmin_lanes(metrics):
        """in-kernel argmin (strict less → first state wins ties)."""
        if metrics.dtype != jnp.float32:
            # Mosaic rejects the (Bt,) bf16 compare chain (1-D i1 vector
            # relayout); one [S, Bt] upcast per MC step is free
            metrics = metrics.astype(jnp.float32)
        best = metrics[0]
        cur = jnp.zeros((Bt,), jnp.uint32)
        for s in range(1, S):
            better = metrics[s] < best
            best = jnp.where(better, metrics[s], best)
            cur = jnp.where(better, np.uint32(s), cur)
        return cur

    def make_tb(bits_ref, dec_ref):
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
        return tb

    return acs_step, init_metrics, argmin_lanes, make_tb, nwords


def _hbase_for(seed_ref, interpret):
    if interpret:
        return _lowbias32(
            seed_ref[0].astype(jnp.uint32) * np.uint32(0x9E3779B9)
            ^ (pl.program_id(0).astype(jnp.uint32) + np.uint32(1))
            * np.uint32(0xC2B2AE35))
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    return None


def _step_base(hbase, step, interpret):
    if interpret:
        return hbase + step.astype(jnp.uint32) * np.uint32(0x85EBCA6B)
    return None


def _mc_kernel(trellis: Trellis, T: int, L: int, Bt: int,
               channel: str = "awgn", demapper: str = "soft",
               interpret: bool = False, use_matmul: bool = False,
               variant: frozenset = frozenset(),
               unroll: int = _TRELLIS_UNROLL):
    """Whole-Monte-Carlo-step kernel: bits→encode→channel→metrics→ACS→
    traceback→error counts, nsteps iterations, all resident in VMEM.  The
    only HBM traffic is the per-lane error counters.

    channel "awgn": Box-Muller noise + soft squared-distance metrics (the
    param is sigma); "bsc": independent coded-bit flips + Hamming metrics
    saturated at 0xFF00 (param is the crossover probability) — the hard
    Viterbi chain of binary-symmetric-channel/main.c.

    ``use_matmul``: one-hot MXU trellis selection for S > _UNROLL_STATES
    (the caller passes the P/E tables as extra kernel inputs).

    ``variant`` tokens (see :func:`mc_chain_viterbi`): ``fast_demap`` and
    ``bf16_acs`` are statistical-contract performance options;
    ``cheap_bm`` / ``static_noise`` / ``cheap_enc`` / ``no_tb`` are
    MEASUREMENT-ONLY ablations (tools/mfu_probe.py) whose output
    statistics are meaningless — they exist to attribute wall time to
    stages at the Mosaic level (PERF.md §1)."""
    code = trellis.code
    S = trellis.num_states
    M = code.points_per_symbol
    K = code.constraint_length
    if S > _FUSED_MAX_STATES:
        raise NotImplementedError(
            f"fused MC kernel supports up to {_FUSED_MAX_STATES} states "
            f"(K <= 9); got {S}")
    esym_of, hard_dists, tx_select, dist_vec, snap = _stage_fns(
        trellis.code, fast_demap="fast_demap" in variant)
    acs_step, init_metrics, argmin_lanes, make_tb, nwords = _acs_fns(
        trellis, T, L, Bt, hard=channel == "bsc", matmul=use_matmul,
        acs_dtype=jnp.bfloat16 if "bf16_acs" in variant else jnp.float32)
    symlen = code.symlen_out
    hard = channel == "bsc"

    def body(seed_ref, sigma_ref, nsteps_ref, err_ref, bits_ref, noise_ref,
             dec_ref, flips_ref, tables):
        hbase = _hbase_for(seed_ref, interpret)
        param = sigma_ref[0]
        row_live = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0) < L

        def gen_data(step):
            sbase = _step_base(hbase, step, interpret)
            # fresh info bits (tail rows forced to zero — encoder.c:112-115)
            rnd = _rand_u32((T, Bt), interpret, sbase, 0)
            bits_ref[:] = jnp.where(row_live, (rnd & 1).astype(jnp.int32), 0)
            if hard:
                # per-coded-bit flip masks packed into a symbol-wide int
                # (binary-symmetric-channel/main.c:61-68)
                u = _rand_uniform((symlen, T, Bt), interpret, sbase, 1)
                fmask = jnp.zeros((T, Bt), jnp.uint32)
                for k in range(symlen):
                    fk = (u[k] < param).astype(jnp.uint32)
                    fmask = fmask | (fk << k)
                flips_ref[:] = fmask.astype(jnp.int32)
            elif "cheap_bm" in variant:
                # ablation: transcendental-free pseudo-noise, same draw
                # count and op *structure* minus log/sqrt/sin/cos
                u = _rand_uniform((2, T, Bt), interpret, sbase, 2)
                noise_ref[0] = u[0] + u[1] - 1.0
                noise_ref[1] = u[0] - u[1]
            else:
                # bulk Box-Muller noise for the whole block
                u = _rand_uniform((2, T, Bt), interpret, sbase, 2)
                r = jnp.sqrt(-2.0 * jnp.log(u[0]))
                theta = jnp.float32(_TWO_PI) * u[1]
                noise_ref[0] = r * jnp.cos(theta)
                noise_ref[1] = r * jnp.sin(theta)

        if "static_noise" in variant:
            gen_data(jnp.int32(0))

        def one_step(step, carry):
            errs, ferrs = carry
            if "static_noise" not in variant:
                gen_data(step)

            def fwd(t, fc):
                metrics, reg = fc
                bitrow = bits_ref[t].astype(jnp.uint32)
                reg = (reg >> 1) | (bitrow << (K - 1))
                if "cheap_enc" in variant:
                    esym = reg & np.uint32(M - 1)  # ablation: no parity
                else:
                    esym = esym_of(reg)
                if hard:
                    dists = hard_dists(esym ^ flips_ref[t].astype(jnp.uint32))
                else:
                    txi, txq = tx_select(esym)
                    rxi = txi + param * noise_ref[0, t]
                    rxq = txq + param * noise_ref[1, t]
                    dists = dist_vec(rxi, rxq)
                    if demapper == "hard":
                        sxi, sxq = snap(dists)
                        dists = dist_vec(sxi, sxq)
                metrics = acs_step(metrics, dists, dec_ref, t, tables)
                return metrics, reg

            metrics, _ = _fori_unrolled(
                T, fwd, (init_metrics(), jnp.zeros((Bt,), jnp.uint32)),
                unroll)
            cur = argmin_lanes(metrics)
            if "no_tb" in variant:
                err = cur.astype(jnp.int32) & 1   # ablation: keep cur live
                fe = err
            else:
                _, err, fe = _fori_unrolled(
                    T, make_tb(bits_ref, dec_ref),
                    (cur, jnp.zeros((Bt,), jnp.int32),
                     jnp.zeros((Bt,), jnp.int32)), unroll)
            return errs + err, ferrs + fe

        # dynamic trip count: a large static bound tempts the compiler to
        # unroll (pathological compile times); dynamic also means one
        # executable serves every sample-size tier
        errs, ferrs = jax.lax.fori_loop(
            0, nsteps_ref[0], one_step,
            (jnp.zeros((Bt,), jnp.int32), jnp.zeros((Bt,), jnp.int32)))
        err_ref[0] = errs
        err_ref[1] = ferrs

    return _with_table_sig(body, use_matmul), nwords


def _with_table_sig(body, use_matmul: bool, nsmem: int = 3):
    """Adapt the kernel body to the pallas_call positional convention:
    ``nsmem`` SMEM scalar inputs, then the P/E tables when present, then
    outputs/scratch."""
    if use_matmul:
        def kernel(*args):
            smem = args[:nsmem]
            tables = args[nsmem:nsmem + 4]
            body(*smem, *args[nsmem + 4:], tables=tuple(tables))
    else:
        def kernel(*args):
            body(*args[:nsmem], *args[nsmem:], tables=None)
    return kernel


def _mc_kernel_bulk(trellis: Trellis, T: int, L: int, Bt: int,
                    channel: str = "awgn", demapper: str = "soft",
                    interpret: bool = False, use_matmul: bool = False):
    """Bulk-staged schedule of :func:`_mc_kernel` (same stage/ACS helpers,
    same RNG draw order → bit-identical counters): encoder, channel and
    demapper run as full ``[T, Bt]`` plane ops into an ``[M, T, Bt]``
    branch-metric scratch BEFORE the trellis loop, whose body shrinks to
    metric loads + ACS.  The shift-register recurrence becomes K static
    row-shifted views of the bit plane (reg[t] = sum_j bits[t-j] <<
    (K-1-j)) — encoder.c's sequential register walk as K shifted ORs."""
    code = trellis.code
    S = trellis.num_states
    M = code.points_per_symbol
    K = code.constraint_length
    if S > _FUSED_MAX_STATES:
        raise NotImplementedError(
            f"fused MC kernel supports up to {_FUSED_MAX_STATES} states "
            f"(K <= 9); got {S}")
    esym_of, hard_dists, tx_select, dist_vec, snap = _stage_fns(trellis.code)
    acs_step, init_metrics, argmin_lanes, make_tb, nwords = _acs_fns(
        trellis, T, L, Bt, hard=channel == "bsc", matmul=use_matmul)
    symlen = code.symlen_out
    hard = channel == "bsc"

    def body(seed_ref, sigma_ref, nsteps_ref, err_ref, bits_ref,
             dec_ref, dists_ref, tables):
        hbase = _hbase_for(seed_ref, interpret)
        param = sigma_ref[0]
        row_live = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0) < L
        zrow = jnp.zeros((1, Bt), jnp.uint32)

        def one_step(step, carry):
            errs, ferrs = carry
            sbase = _step_base(hbase, step, interpret)
            # fresh info bits (tail rows forced to zero — encoder.c:112-115)
            rnd = _rand_u32((T, Bt), interpret, sbase, 0)
            bits_ref[:] = jnp.where(row_live, (rnd & 1).astype(jnp.int32), 0)

            # ---- bulk encode: register plane from K shifted bit views ----
            bplane = bits_ref[:].astype(jnp.uint32)
            reg = bplane << (K - 1)
            for j in range(1, K):
                shifted = jnp.concatenate(
                    [jnp.broadcast_to(zrow, (j, Bt)), bplane[:T - j]], axis=0)
                reg = reg | (shifted << (K - 1 - j))
            esym = esym_of(reg)

            # ---- bulk channel + demap into the [M, T, Bt] metric plane ----
            if hard:
                u = _rand_uniform((symlen, T, Bt), interpret, sbase, 1)
                fmask = jnp.zeros((T, Bt), jnp.uint32)
                for k in range(symlen):
                    fk = (u[k] < param).astype(jnp.uint32)
                    fmask = fmask | (fk << k)
                for e, d in enumerate(hard_dists(esym ^ fmask)):
                    dists_ref[e] = d
            else:
                u = _rand_uniform((2, T, Bt), interpret, sbase, 2)
                r = jnp.sqrt(-2.0 * jnp.log(u[0]))
                theta = jnp.float32(_TWO_PI) * u[1]
                txi, txq = tx_select(esym)
                rxi = txi + param * (r * jnp.cos(theta))
                rxq = txq + param * (r * jnp.sin(theta))
                if demapper == "hard":
                    rxi, rxq = snap(dist_vec(rxi, rxq))
                for e, d in enumerate(dist_vec(rxi, rxq)):
                    dists_ref[e] = d

            # ---- trellis loop: loads + ACS only ----
            def fwd(t, metrics):
                dists = [dists_ref[e, t] for e in range(M)]
                return acs_step(metrics, dists, dec_ref, t, tables)

            metrics = _fori_unrolled(T, fwd, init_metrics(),
                                     _TRELLIS_UNROLL)
            cur = argmin_lanes(metrics)
            _, err, fe = _fori_unrolled(
                T, make_tb(bits_ref, dec_ref),
                (cur, jnp.zeros((Bt,), jnp.int32),
                 jnp.zeros((Bt,), jnp.int32)), _TRELLIS_UNROLL)
            return errs + err, ferrs + fe

        errs, ferrs = jax.lax.fori_loop(
            0, nsteps_ref[0], one_step,
            (jnp.zeros((Bt,), jnp.int32), jnp.zeros((Bt,), jnp.int32)))
        err_ref[0] = errs
        err_ref[1] = ferrs

    return _with_table_sig(body, use_matmul), nwords


#: recognized variant tokens for :func:`mc_chain_viterbi` — the first two
#: are opt-in statistical-contract performance options, the rest are
#: measurement-only ablations (tools/mfu_probe.py; statistics invalid)
_VARIANTS = {"fast_demap", "bf16_acs",
             "cheap_bm", "static_noise", "cheap_enc", "no_tb"}


def mc_chain_viterbi(code: Code, batch: int, nsteps: int, seed, param,
                     channel: str = "awgn", block_lanes: int = 1024,
                     interpret: bool = False, demapper: str = "soft",
                     bulk_stages: bool = False, variant: str = "",
                     unroll: int = _TRELLIS_UNROLL
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``nsteps`` whole Monte-Carlo steps of the Viterbi chain entirely
    on-chip.  ``channel``: "awgn" (param = sigma, soft decode) or "bsc"
    (param = crossover probability, hard decode with saturating metrics).
    ``bulk_stages`` selects the bulk-staged kernel schedule (identical
    counters, different op schedule).  Returns per-lane (bit_errors [B],
    frame_errors [B]) int32 counters; total simulated info bits =
    batch * nsteps * block_len.

    ``variant``: comma-separated tokens from ``_VARIANTS`` (loop schedule
    only).  ``fast_demap``/``bf16_acs`` trade the reference's exact float
    expressions for fewer/narrower VPU ops — BER equivalence is
    statistical (z-tested), not bit-exact.  The remaining tokens are
    measurement-only stage ablations.  ``unroll`` overrides the trellis
    loop unroll factor (must divide T or it falls back to a plain loop).
    """
    trellis = build_trellis(code)
    T, L = code.num_block_symbols, code.block_length
    M = code.points_per_symbol
    Bt = min(block_lanes, batch)
    if batch % Bt:
        raise ValueError(f"batch {batch} not divisible by tile {Bt}")
    var = frozenset(t for t in variant.split(",") if t)
    if var - _VARIANTS:
        raise ValueError(f"unknown variant tokens {sorted(var - _VARIANTS)}")
    if var and bulk_stages:
        raise ValueError("variants are loop-schedule only")
    nwords = (trellis.num_states + 31) // 32
    use_matmul = trellis.num_states > _UNROLL_STATES
    if use_matmul and "bf16_acs" in var:
        raise ValueError("bf16_acs requires the non-matmul ACS path")
    if bulk_stages:
        kernel, _ = _mc_kernel_bulk(trellis, T, L, Bt, channel, demapper,
                                    interpret=interpret,
                                    use_matmul=use_matmul)
    else:
        kernel, _ = _mc_kernel(trellis, T, L, Bt, channel, demapper,
                               interpret=interpret, use_matmul=use_matmul,
                               variant=var, unroll=unroll)
    if bulk_stages:
        scratch = [
            pltpu.VMEM((T, Bt), jnp.int32),              # info bits
            pltpu.VMEM((T, nwords, Bt), jnp.int32),      # packed decisions
            pltpu.VMEM((M, T, Bt), jnp.float32),         # branch-metric planes
        ]
    else:
        scratch = [
            pltpu.VMEM((T, Bt), jnp.int32),              # info bits
            pltpu.VMEM((2, T, Bt), jnp.float32),         # I/Q noise
            pltpu.VMEM((T, nwords, Bt), jnp.int32),      # packed decisions
            pltpu.VMEM((T, Bt), jnp.int32),              # BSC flip masks
        ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [
        jnp.asarray([seed], jnp.int32) if np.ndim(seed) == 0 else seed,
        jnp.asarray([param], jnp.float32) if np.ndim(param) == 0 else param,
        jnp.asarray([nsteps], jnp.int32)]
    if use_matmul:
        P0, P1, E0, E1, _, _ = _tables(trellis)
        for tab in (P0, P1, E0, E1):
            in_specs.append(pl.BlockSpec(
                tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
            operands.append(jnp.asarray(tab))
    errs = pl.pallas_call(
        kernel,
        grid=(batch // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, batch), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    return errs[0], errs[1]


def mc_awgn_viterbi(code: Code, batch: int, nsteps: int, seed, sigma,
                    block_lanes: int = 1024, interpret: bool = False):
    return mc_chain_viterbi(code, batch, nsteps, seed, sigma, "awgn",
                            block_lanes, interpret)


def mc_bsc_viterbi(code: Code, batch: int, nsteps: int, seed, crossover,
                   block_lanes: int = 1024, interpret: bool = False):
    return mc_chain_viterbi(code, batch, nsteps, seed, crossover, "bsc",
                            block_lanes, interpret)
