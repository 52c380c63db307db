"""Fused long-frame Monte-Carlo chain kernel (BASELINE configs 0 and 2).

The block-code flagship kernel (ops/fused_chain.py) runs whole Monte-Carlo
steps of short terminated blocks in VMEM.  The long-frame configurations
(config 0: K=3 hard Viterbi over 1e6-bit BSC frames; config 2: K=7 NASA
soft Viterbi over long AWGN streams — BASELINE.json, mirroring the
reference chains at ``binary-symmetric-channel/main.c:57-98`` /
``AWGN-channel/main.c:80-144`` scaled past the reference's ~200-bit uint8
block limit) need the same treatment, but a million-symbol trellis cannot
sit in one lane.

Design: **overlap-save windows on independent per-lane streams.**  Every
VPU lane simulates its *own* unterminated coded stream (the continuous
limit of very long frames — boundary terms are O(K/T) ≈ 1e-5 of the BER
at 1e6-bit frames) and decodes it in ``window``-symbol payload slices with
``warmup``-symbol halos on both sides, the same partitioning the
multi-chip streaming decoder uses across devices
(parallel/streaming.py).  The left halo warms the path metrics from a
uniform start; the right halo lets the traceback re-converge onto the
survivor path; only payload bits are error-counted.  Boundary-mismatch
probability decays exponentially in ``warmup`` (see
streaming.warmup_convergence_audit); at the default 128 symbols it is far
below Monte-Carlo resolution.

RNG: halo consistency requires the same (lane, stream-position) to yield
the same bits/noise in *every* window that covers it, so all randomness is
a pure counter hash of (seed, global lane id, stream position, draw salt)
— two rounds of the murmur3 finalizer, computed in-kernel with plain
vector integer ops (TPU-native: no state, any layout).  This replaces
``pltpu.prng_random_bits`` (a sequential stream, not coordinate
addressable); distribution-level equivalence with the reference's RNG is
the contract (SURVEY.md §2e), validated statistically in
tests/test_fused_longframe.py against the threefry XLA chain.
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
from convolutional_codes_tpu.models.trellis import Trellis, build_trellis
from convolutional_codes_tpu.ops.viterbi_pallas import _tables, _UNROLL_STATES
from convolutional_codes_tpu.ops.fused_chain import (
    _FUSED_MAX_STATES, _acs_fns, _stage_fns, _with_table_sig)

_TWO_PI = 2.0 * math.pi


def _fmix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer (public-domain constants)."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def coord_bits(lane: jnp.ndarray, pos: jnp.ndarray, seed: jnp.ndarray,
               salt: int) -> jnp.ndarray:
    """uint32 hash of (seed, lane, pos, salt): two finalizer rounds over a
    Weyl-mixed counter.  ``lane``/``pos`` broadcast against each other."""
    c = (pos.astype(jnp.uint32) * np.uint32(0x9E3779B9)
         ^ lane.astype(jnp.uint32) * np.uint32(0x7FEB352D))
    c = c + seed.astype(jnp.uint32) + np.uint32((salt * 0x68E31DA4) & 0xFFFFFFFF)
    return _fmix32(_fmix32(c) ^ lane.astype(jnp.uint32))


def coord_uniform(lane, pos, seed, salt) -> jnp.ndarray:
    """(0, 1) float32 with 31-bit resolution (Box-Muller tail reach ~6.6
    sigma — same argument as fused_chain._uniform_from_bits)."""
    bits = (coord_bits(lane, pos, seed, salt) >> 1).astype(jnp.int32)
    return (bits.astype(jnp.float32) * jnp.float32(2.0 ** -31)
            + jnp.float32(2.0 ** -32))


def _mc_longframe_kernel(trellis: Trellis, Tw: int, W: int, Bt: int,
                         channel: str, demapper: str, use_matmul: bool):
    """Per-tile kernel: ``nsteps`` windows per lane, each Tw symbols with
    [W | payload | W] structure; everything VMEM-resident, HBM traffic is
    the per-lane error counters.

    Stream-position convention: window ``step`` of a lane covers positions
    ``step*Wn + t - W`` for t in [0, Tw), Wn = Tw - 2W; the kernel also
    draws the K-1 bits before the window to seed the encoder register, so
    halo overlap regions replay identical bits/noise in both windows.
    """
    code = trellis.code
    S = trellis.num_states
    M = code.points_per_symbol
    K = code.constraint_length
    if S > _FUSED_MAX_STATES:
        raise NotImplementedError(
            f"fused long-frame kernel supports up to {_FUSED_MAX_STATES} "
            f"states (K <= 9); got {S}")
    Wn = Tw - 2 * W
    esym_of, hard_dists, tx_select, dist_vec, snap = _stage_fns(trellis.code)
    # L is unused by the pieces we take (we build our own traceback)
    acs_step, _, argmin_lanes, _, nwords = _acs_fns(
        trellis, Tw, Wn, Bt, hard=channel == "bsc", matmul=use_matmul)
    symlen = code.symlen_out
    hard = channel == "bsc"
    half_mask = (S >> 1) - 1
    Tb = Tw + K - 1                       # bit rows incl. register lead-in

    def body(seed_ref, sigma_ref, nsteps_ref, win0_ref, err_ref, bits_ref,
             noise_ref, dec_ref, flips_ref, tables):
        seed = seed_ref[0]
        param = sigma_ref[0]
        # win0: global window offset of this device's shard.  Windows are
        # independent decodes of hash-addressed stream positions, so a
        # 'seq'-axis shard_map (parallel/streaming.streaming_mc_accumulate)
        # splits each lane's stream BY TIME RANGE across devices — sequence
        # parallelism where the halo is regenerated locally instead of
        # exchanged over ICI, bit-identical to the monolithic run.
        win0 = win0_ref[0]
        # two index grids (bit rows incl. lead-in, and symbol rows): built
        # as separate iotas — Mosaic rejects sublane-offset value slices
        lane_b = (jax.lax.broadcasted_iota(jnp.uint32, (Tb, Bt), 1)
                  + np.uint32(Bt) * pl.program_id(0).astype(jnp.uint32))
        trow_b = jax.lax.broadcasted_iota(jnp.int32, (Tb, Bt), 0)
        lane_s = (jax.lax.broadcasted_iota(jnp.uint32, (Tw, Bt), 1)
                  + np.uint32(Bt) * pl.program_id(0).astype(jnp.uint32))
        trow_s = jax.lax.broadcasted_iota(jnp.int32, (Tw, Bt), 0)

        def one_step(step, carry):
            errs, werrs = carry
            # global stream position: bit row 0 is the earliest lead-in
            # bit, K-1 rows before the window's first symbol.  Positions go
            # negative for step 0's left halo — fine, the hash is defined
            # on the wrapped uint32 counter.
            pos_b = (trow_b - (W + K - 1)) + (win0 + step) * Wn
            pos_s = (trow_s - W) + (win0 + step) * Wn

            # info bits for [lead-in + window] — pure function of position
            bits_ref[:] = (coord_bits(lane_b, pos_b, seed, 0)
                           & 1).astype(jnp.int32)
            if hard:
                fmask = jnp.zeros((Tw, Bt), jnp.uint32)
                for k in range(symlen):
                    fk = (coord_uniform(lane_s, pos_s, seed, 1 + k)
                          < param).astype(jnp.uint32)
                    fmask = fmask | (fk << k)
                flips_ref[:] = fmask.astype(jnp.int32)
            else:
                u0 = coord_uniform(lane_s, pos_s, seed, 1)
                u1 = coord_uniform(lane_s, pos_s, seed, 2)
                r = jnp.sqrt(-2.0 * jnp.log(u0))
                theta = jnp.float32(_TWO_PI) * u1
                noise_ref[0] = r * jnp.cos(theta)
                noise_ref[1] = r * jnp.sin(theta)

            # seed the encoder register from the K-1 lead-in bits
            reg0 = jnp.zeros((Bt,), jnp.uint32)
            for j in range(K - 1):
                reg0 = (reg0 >> 1) | (bits_ref[j].astype(jnp.uint32) << (K - 1))

            def fwd(t, fc):
                metrics, reg = fc
                bitrow = bits_ref[t + K - 1].astype(jnp.uint32)
                reg = (reg >> 1) | (bitrow << (K - 1))
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

            # uniform metric start: the left halo performs the warmup
            metrics, _ = jax.lax.fori_loop(
                0, Tw, fwd, (jnp.zeros((S, Bt), jnp.float32), reg0))
            cur = argmin_lanes(metrics)

            def tb(i, tc):
                cur, err, we = tc
                t = Tw - 1 - i
                if nwords == 1:
                    word = dec_ref[t, 0].astype(jnp.uint32)
                else:
                    widx = (cur >> 5).astype(jnp.uint32)
                    word = dec_ref[t, 0].astype(jnp.uint32)
                    for w in range(1, nwords):
                        word = jnp.where(widx == w,
                                         dec_ref[t, w].astype(jnp.uint32),
                                         word)
                b = (word >> (cur & 31)) & 1
                bit = (cur >> (K - 2)).astype(jnp.int32)
                payload = (t >= W) & (t < W + Wn)
                mism = ((bit != bits_ref[t + K - 1]) & payload).astype(jnp.int32)
                err = err + mism
                we = we | mism
                cur = ((cur & half_mask) << 1) | b
                return cur, err, we

            _, err, we = jax.lax.fori_loop(
                0, Tw, tb, (cur, jnp.zeros((Bt,), jnp.int32),
                            jnp.zeros((Bt,), jnp.int32)))
            return errs + err, werrs + we

        errs, werrs = jax.lax.fori_loop(
            0, nsteps_ref[0], one_step,
            (jnp.zeros((Bt,), jnp.int32), jnp.zeros((Bt,), jnp.int32)))
        err_ref[0] = errs
        err_ref[1] = werrs

    return _with_table_sig(body, use_matmul, nsmem=4), nwords


def mc_longframe_viterbi(code: Code, lanes: int, nsteps: int, seed, param,
                         channel: str = "awgn", demapper: str = "soft",
                         window: int = 1920, warmup: int = 128,
                         block_lanes: int = 1024, win0=0,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Monte-Carlo long-frame Viterbi chain, fully fused in VMEM.

    Each of ``lanes`` independent coded streams advances ``nsteps`` windows
    of ``window`` payload symbols (+``warmup`` halos).  Returns per-lane
    (bit_errors, window_errors) int32; simulated info bits =
    ``lanes * nsteps * window``.

    ``channel``: "awgn" (param = sigma, soft metrics) or "bsc" (param =
    crossover probability, saturating Hamming metrics) — the long-frame
    halves of BASELINE configs 2 and 0 respectively.

    ``interpret=True`` runs the identical kernel under the Pallas CPU
    interpreter (the coordinate-hash RNG needs no hardware PRNG, so unlike
    fused_chain the interpret path is bit-identical to the TPU path).
    """
    trellis = build_trellis(code)
    Tw = window + 2 * warmup
    if channel == "bsc" and 2 * Tw >= 0xFF00:
        raise ValueError(f"window+halos {Tw} too long for saturating "
                         "hard metrics (metric ceiling 0xFF00)")
    Bt = min(block_lanes, lanes)
    if lanes % Bt:
        raise ValueError(f"lanes {lanes} not divisible by tile {Bt}")
    use_matmul = trellis.num_states > _UNROLL_STATES
    kernel, nwords = _mc_longframe_kernel(
        trellis, Tw, warmup, Bt, channel, demapper, use_matmul)
    K = code.constraint_length
    hard = channel == "bsc"
    scratch = [
        pltpu.VMEM((Tw + K - 1, Bt), jnp.int32),     # info bits (+lead-in)
        # only the active channel's plane is full-size (VMEM is the scarce
        # resource at long windows)
        pltpu.VMEM((2, 8, Bt) if hard else (2, Tw, Bt), jnp.float32),
        pltpu.VMEM((Tw, nwords, Bt), jnp.int32),     # packed decisions
        pltpu.VMEM((Tw, Bt) if hard else (8, Bt), jnp.int32),  # flip masks
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [
        jnp.asarray([seed], jnp.int32) if np.ndim(seed) == 0 else seed,
        jnp.asarray([param], jnp.float32) if np.ndim(param) == 0 else param,
        jnp.asarray([nsteps], jnp.int32),
        jnp.asarray([win0], jnp.int32) if np.ndim(win0) == 0 else win0]
    if use_matmul:
        P0, P1, E0, E1, _, _ = _tables(trellis)
        for tab in (P0, P1, E0, E1):
            in_specs.append(pl.BlockSpec(
                tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM))
            operands.append(jnp.asarray(tab))
    errs = pl.pallas_call(
        kernel,
        grid=(lanes // Bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # long windows need more than the 16 MiB default scoped VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*operands)
    return errs[0], errs[1]


# ---------------------------------------------------------------------------
# Pure-XLA replica of the same stream (validation / cross-checking)
# ---------------------------------------------------------------------------

def stream_segment_host(code: Code, lane_ids: np.ndarray, seed: int,
                        param: float, channel: str, start: int, length: int,
                        demapper: str = "soft"):
    """Rebuild the exact (bits, branch-metric) stream segment the kernel
    simulates for the given lanes — same coordinate hash, same Box-Muller /
    flip draws, float32 expression order — using plain jnp ops.  Returns
    (bits [B, length], dists [B, length, 2^m]).  Used by tests to decode
    the identical stream with the monolithic XLA Viterbi."""
    trellis = build_trellis(code)
    K = code.constraint_length
    M = code.points_per_symbol
    symlen = code.symlen_out
    lanes = jnp.asarray(lane_ids, jnp.uint32)[:, None]
    pos = jnp.arange(start - (K - 1), start + length)[None, :]
    seed_a = jnp.uint32(seed)

    bits = (coord_bits(lanes, pos, seed_a, 0) & 1).astype(jnp.int32)
    # register plane from K shifted views of the bit plane:
    # reg[t] = sum_j bits[t + K-1 - j] << (K-1-j)  (newest bit at K-1)
    barr = bits.astype(jnp.uint32)
    reg = jnp.zeros((barr.shape[0], length), jnp.uint32)
    for j in range(K):
        reg = reg | (barr[:, K - 1 - j: K - 1 - j + length] << (K - 1 - j))
    esym_of, hard_dists, tx_select, dist_vec, snap = _stage_fns(trellis.code)
    esym = esym_of(reg)

    ppos = pos[:, K - 1:]
    if channel == "bsc":
        fmask = jnp.zeros(esym.shape, jnp.uint32)
        for k in range(symlen):
            fk = (coord_uniform(lanes, ppos, seed_a, 1 + k)
                  < jnp.float32(param)).astype(jnp.uint32)
            fmask = fmask | (fk << k)
        dvec = hard_dists(esym ^ fmask)
    else:
        u0 = coord_uniform(lanes, ppos, seed_a, 1)
        u1 = coord_uniform(lanes, ppos, seed_a, 2)
        r = jnp.sqrt(-2.0 * jnp.log(u0))
        theta = jnp.float32(_TWO_PI) * u1
        txi, txq = tx_select(esym)
        rxi = txi + jnp.float32(param) * (r * jnp.cos(theta))
        rxq = txq + jnp.float32(param) * (r * jnp.sin(theta))
        dvec = dist_vec(rxi, rxq)
        if demapper == "hard":
            sxi, sxq = snap(dvec)
            dvec = dist_vec(sxi, sxq)
    dists = jnp.stack(dvec, axis=-1)
    return bits[:, K - 1:], dists
