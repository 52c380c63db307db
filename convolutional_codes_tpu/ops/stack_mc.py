"""Fused stack-decoder Monte-Carlo kernel with in-kernel lane refill.

The stack twin of ops/fano_mc.py: each VPU lane runs a sequence of
independent frames through the bit-exact ZJ/stack search of
ops/stack_pallas.py; when a lane's frame finishes it banks its error
counts and hash-generates its next frame inside the kernel
(ops/mc_datagen), so the lockstep tile pays per-lane mean work instead of
the max of 128 single-frame searches and never round-trips through host
compaction (ops/seq_chunking) or per-batch channel fronts.

Reference semantics: AWGN-channel/stack-decoder.c:133-276 and the BSC
twin (drivers main.c:80-144 / :57-98); the micro-step is the
stack_pallas machine verbatim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.ops.mc_datagen import frames_host, make_datagen
from convolutional_codes_tpu.ops.stack import STACK_DEPTH
from convolutional_codes_tpu.ops.stack_pallas import _make_branch

_BIG = 3e38
_FMAX = np.float32(3.4028235e38)

#: int32 control rows [per lane]
(_NSTACK, _WIDX, _MDONE, _BANKED, _FDONE, _BERR, _FERR, _ALLDN) = range(8)
_CI_ROWS = 8

#: micro-steps between refill checks (see ops/fano_mc.py — also bounds the
#: traced chunk body, which dominates interpret-mode compile time)
_REFILL_EVERY = 32


def _no_chain() -> bool:
    """Measurement escape hatch: CONVCODES_NO_CHAIN=1 disables the round-5
    phase chaining (identical counters, more micro-steps) so A/B timing
    runs can compare the two steppings inside one session."""
    import os
    return bool(os.environ.get("CONVCODES_NO_CHAIN"))


#: bounded wait for the batched refill gate: even when fewer than
#: active/div lanes are idle, fire at least every this many 32-step
#: chunks once anybody waits — caps the idle-slot cost at rare-finish
#: operating points (timeout-bound cliffs) where the ratio alone would
#: strand a finished lane for a large fraction of a walk
_REFILL_WAIT = 4


def _refill_gate_div(soft: bool, M: int) -> int:
    """Batched refill gate divisor (round 5): the refill block — a
    full-width datagen over every lane — fires only once the number of
    idle finished lanes reaches ``1/div`` of the tile's still-active
    lanes (or ``_REFILL_WAIT`` chunks pass), instead of whenever ANY
    lane pends.  Measured A/B (tools/refill_gate_probe.py): batching
    pays only where the datagen is fat relative to the micro-step —
    the M>=8 soft constellations, whose M distance planes + select
    chains make a refill cost ~tens of micro-steps (K=15 + 16-QAM @
    8 dB: +27%) — while at M=4 the datagen is ~1-2 micro-steps' worth
    and the idle-slot cost of waiting for a batch dominates (k3 @
    0-6 dB: -4..-8%).  So the divisor is config-static: 8 for soft
    M>=8, else 1 (the original any-lane gate).  Deadlock-free: when
    every active lane waits, the ratio is 1 >= 1/div.  Counters are
    bit-identical for any divisor (datagen is addressed by (lane,
    frame-id), never by time — ops/mc_datagen).  CONVCODES_REFILL_GATE
    overrides the auto choice (<= 1 forces the any-lane gate) for A/B
    timing."""
    import os
    v = os.environ.get("CONVCODES_REFILL_GATE")
    if v:
        return int(v)
    return 8 if (soft and M >= 8) else 1


def _stack_mc_kernel(code: Code, T: int, L: int, Bt: int, channel: str,
                     demapper: str, nwords: int):
    D = STACK_DEPTH
    M = code.points_per_symbol
    symlen = code.symlen_out
    K = code.constraint_length
    branch = _make_branch(code)
    datagen = make_datagen(code, T, L, channel, demapper)
    soft = channel == "awgn"
    if soft:
        w = float(code.metric_weight)
    else:
        correct, wrong = int(code.bit_metrics[0]), int(code.bit_metrics[1])

    def kernel(iters_ref, seed_ref, param_ref, fpl_ref, lane0_ref,
               nii_in, st_in, met_in, bits_in, ci_in, syms_in, tx_in,
               nii_ref, st_ref, met_ref, bits_ref, ci_ref, syms_ref, tx_ref):
        nii_ref[:] = nii_in[:]
        st_ref[:] = st_in[:]
        met_ref[:] = met_in[:]
        bits_ref[:] = bits_in[:]
        ci_ref[:] = ci_in[:]
        syms_ref[:] = syms_in[:]
        tx_ref[:] = tx_in[:]

        seed = seed_ref[0]
        param = param_ref[0]
        fpl = fpl_ref[0]
        slot2d = jax.lax.broadcasted_iota(jnp.int32, (D, Bt), 0)
        row2d = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0)
        # lane0: global lane offset of this device's shard (see
        # ops/fano_mc.py — sharded runs are bit-identical to serial ones)
        lane2d = (jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 1)
                  + Bt * pl.program_id(0) + lane0_ref[0])
        live2d = row2d < L

        def first_of(pred2d):
            cand = jnp.where(pred2d, slot2d, D)
            return jnp.min(cand, axis=0)

        def micro():
            # verbatim stack_pallas micro-step (stack-decoder.c:133-276)
            nii2d = nii_ref[:]
            met2d = met_ref[:]
            nstack = ci_ref[_NSTACK]
            widx = ci_ref[_WIDX]
            done = ci_ref[_MDONE] > 0

            live = slot2d < nstack[None, :]
            wm = jnp.where(live, met2d, -_BIG)
            mbest = jnp.max(wm, axis=0)
            cur = first_of(live & (met2d == mbest[None, :]))
            curmask = slot2d == cur[None, :]

            cur_nii = jnp.sum(jnp.where(curmask, nii2d, 0), axis=0)
            caught = cur_nii == widx

            finished = caught & (widx == T)
            advance = caught & (widx < T) & jnp.logical_not(done)
            ci_ref[_WIDX] = jnp.where(advance, widx + 1, widx)
            done = done | finished
            ci_ref[_MDONE] = done.astype(jnp.int32)

            # Phase chaining (round 5, cf. ops/fano_mc.py): a caught lane
            # advances widx and then — in the reference — re-pops the
            # SAME best node (the advance mutates nothing else) and
            # extends it (stack-decoder.c:139,169-170: the while re-enters
            # with get_most_probable_path on an unchanged stack).  Running
            # that extension in the same micro-step with the already-
            # gathered cur/s/m/t is exactly the two sequential reference
            # iterations, so counts stay bit-identical while the
            # once-per-accepted-symbol bookkeeping step disappears.
            # (CONVCODES_NO_CHAIN=1 restores the unchained stepping for
            # A/B measurement — counters are identical either way.)
            if _no_chain():
                ext = jnp.logical_not(caught) & jnp.logical_not(done)
            else:
                ext = ((jnp.logical_not(caught) | advance)
                       & jnp.logical_not(done))
            s = jnp.sum(jnp.where(curmask, st_ref[:], 0),
                        axis=0).astype(jnp.uint32)
            m = jnp.sum(jnp.where(curmask, met2d, 0.0), axis=0)
            t = jnp.clip(cur_nii, 0, T - 1)
            ns0, e0 = branch(s, 0)
            ns1, e1 = branch(s, 1)

            if soft:
                tmask = (row2d == t[None, :])[:, None, :]
                trow = jnp.sum(jnp.where(tmask, syms_ref[:], 0.0), axis=0)
                d0 = jnp.zeros((Bt,), jnp.float32)
                d1 = jnp.zeros((Bt,), jnp.float32)
                for e in range(M):
                    d0 = jnp.where(e0 == np.uint32(e), trow[e], d0)
                    d1 = jnp.where(e1 == np.uint32(e), trow[e], d1)
                tm0 = 1.0 + jnp.minimum(w * d0, _FMAX)
                tm1 = 1.0 + jnp.minimum(w * d1, _FMAX)
            else:
                tmask = row2d == t[None, :]
                rx = jnp.sum(jnp.where(tmask, syms_ref[:], 0),
                             axis=0).astype(jnp.uint32)
                x0, x1 = e0 ^ rx, e1 ^ rx
                h0 = x0 & np.uint32(1)
                h1 = x1 & np.uint32(1)
                for k in range(1, symlen):
                    h0 = h0 + ((x0 >> k) & np.uint32(1))
                    h1 = h1 + ((x1 >> k) & np.uint32(1))
                h0 = h0.astype(jnp.int32).astype(jnp.float32)
                h1 = h1.astype(jnp.int32).astype(jnp.float32)
                tm0 = h0 * float(wrong) + (float(symlen) - h0) * float(correct)
                tm1 = h1 * float(wrong) + (float(symlen) - h1) * float(correct)

            at_cap = nstack >= D
            mworst = jnp.min(jnp.where(live, met2d, _BIG), axis=0)
            worst = first_of(live & (met2d == mworst[None, :]))
            new = jnp.where(at_cap, worst, nstack)
            newmask = (slot2d == new[None, :]) & ext[None, :]
            curwr = curmask & ext[None, :]

            # duplicate (input 1) first — from the original's fields.
            # Alias corner (best slot == worst slot, all live metrics
            # exactly equal at capacity): the input-0 write wins and
            # newonly keeps the decoded-bit plane consistent with it —
            # see ops/stack_pallas.py for the full note on this documented
            # divergence from the C reference's double-extension.
            newonly = newmask & jnp.logical_not(curwr)
            bpos = (t & 31).astype(jnp.uint32)
            setbit = jnp.uint32(1) << bpos
            nii_new = (cur_nii + 1)[None, :]
            st1 = ns1.astype(jnp.int32)[None, :]
            met1 = (m + tm1)[None, :]
            for wd in range(nwords):
                currow = jnp.sum(jnp.where(curmask, bits_ref[wd], 0), axis=0)
                sb = jnp.where((t >> 5) == wd, setbit, np.uint32(0))
                row1 = (currow.astype(jnp.uint32) | sb).astype(jnp.int32)
                bits_ref[wd] = jnp.where(newonly, row1[None, :],
                                         bits_ref[wd])
            nii2d = jnp.where(newmask, nii_new, nii_ref[:])
            st2d = jnp.where(newmask, st1, st_ref[:])
            met2d = jnp.where(newmask, met1, met_ref[:])

            # original takes input 0 (bit stays 0)
            nii_ref[:] = jnp.where(curwr, nii_new, nii2d)
            st_ref[:] = jnp.where(curwr, ns0.astype(jnp.int32)[None, :],
                                  st2d)
            met_ref[:] = jnp.where(curwr, (m + tm0)[None, :], met2d)

            ci_ref[_NSTACK] = jnp.where(ext & jnp.logical_not(at_cap),
                                        nstack + 1, nstack)

        def refill():
            mdone = ci_ref[_MDONE] > 0
            banked = ci_ref[_BANKED] > 0
            fdone = ci_ref[_FDONE]
            bank = mdone & jnp.logical_not(banked)

            # winner extraction (first-max over live slots, as _extract)
            nstack = ci_ref[_NSTACK]
            met2d = met_ref[:]
            live = slot2d < nstack[None, :]
            mbest = jnp.max(jnp.where(live, met2d, -_BIG), axis=0)
            cur = first_of(live & (met2d == mbest[None, :]))
            curmask = slot2d == cur[None, :]
            # unpack the winner's packed bit words over the payload rows
            word_rows = jnp.zeros((T, Bt), jnp.uint32)
            for wd in range(nwords):
                wrow = jnp.sum(jnp.where(curmask, bits_ref[wd], 0),
                               axis=0).astype(jnp.uint32)
                word_rows = jnp.where((row2d >> 5) == wd, wrow[None, :],
                                      word_rows)
            dec = (word_rows >> (row2d & 31).astype(jnp.uint32)) & 1
            mism = ((dec.astype(jnp.int32) != tx_ref[:])
                    & live2d & bank[None, :])
            errs = jnp.sum(mism.astype(jnp.int32), axis=0)
            ci_ref[_BERR] = ci_ref[_BERR] + errs
            ci_ref[_FERR] = ci_ref[_FERR] + (bank & (errs > 0)).astype(jnp.int32)
            fdone = fdone + bank.astype(jnp.int32)
            banked = banked | bank

            regen = mdone & banked & (fdone < fpl)
            gid2d = lane2d * fpl + fdone[None, :]
            newbits, newsyms = datagen(gid2d, row2d, seed, param,
                                       taxis=0, stack_axis=1)
            tx_ref[:] = jnp.where(regen[None, :], newbits, tx_ref[:])
            if soft:
                syms_ref[:] = jnp.where(regen[None, None, :], newsyms,
                                        syms_ref[:])
            else:
                syms_ref[:] = jnp.where(regen[None, :], newsyms, syms_ref[:])

            # machine reset (matches stack_pallas._init_state)
            rg = regen[None, :]
            nii_ref[:] = jnp.where(rg, 0, nii_ref[:])
            st_ref[:] = jnp.where(rg, 0, st_ref[:])
            met_ref[:] = jnp.where(rg, 0.0, met_ref[:])
            rg3 = regen[None, None, :]
            bits_ref[:] = jnp.where(rg3, 0, bits_ref[:])
            ci_ref[_NSTACK] = jnp.where(regen, 1, ci_ref[_NSTACK])
            ci_ref[_WIDX] = jnp.where(regen, 1, ci_ref[_WIDX])
            ci_ref[_MDONE] = jnp.where(regen, 0, ci_ref[_MDONE])
            ci_ref[_BANKED] = (banked & jnp.logical_not(regen)).astype(jnp.int32)
            ci_ref[_FDONE] = fdone
            ci_ref[_ALLDN] = (fdone >= fpl).astype(jnp.int32)

        gd = _refill_gate_div(soft, M)

        def chunk(_i, since):
            # batched gate (_refill_gate_div): serve finished lanes in
            # batches of >= active/div (bounded by _REFILL_WAIT chunks)
            # instead of one-at-a-time, so the full-width datagen
            # amortizes; identical counters (the datagen is (lane,
            # frame-id)-addressed, not time-addressed).  ``since`` rides
            # the fori_loop carry: chunks since the last refill fired.
            att = (ci_ref[_MDONE] > 0) & (ci_ref[_ALLDN] == 0)
            if gd <= 1:
                fire = jnp.any(att)
            else:
                natt = jnp.sum(att.astype(jnp.int32))
                nact = jnp.sum((ci_ref[_ALLDN] == 0).astype(jnp.int32))
                fire = (natt > 0) & ((natt * gd >= nact)
                                     | (since >= _REFILL_WAIT))
            @pl.when(fire)
            def _():
                refill()

            @pl.when(jnp.logical_not(jnp.all(ci_ref[_ALLDN] > 0)))
            def _():
                for _ in range(_REFILL_EVERY):
                    micro()
            return jnp.where(fire, 0, since + 1)

        jax.lax.fori_loop(0, iters_ref[0] // _REFILL_EVERY, chunk, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _stack_mc_pallas(code: Code, B: int, Bt: int, channel: str,
                     demapper: str, interpret: bool):
    """The raw pallas_call over ``B`` lanes (``B`` is the *local* lane count
    when the call runs under a shard_map — parallel/seq_grid.py)."""
    T = code.num_block_symbols
    L = code.block_length
    M = code.points_per_symbol
    D = STACK_DEPTH
    nwords = (T + 31) // 32
    soft = channel == "awgn"
    kernel = _stack_mc_kernel(code, T, L, Bt, channel, demapper, nwords)

    if soft:
        sym_spec = pl.BlockSpec((T, M, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        sym_shape = jax.ShapeDtypeStruct((T, M, B), jnp.float32)
    else:
        sym_spec = pl.BlockSpec((T, Bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        sym_shape = jax.ShapeDtypeStruct((T, B), jnp.int32)

    def spec2(rows):
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    state_specs = [
        spec2(D), spec2(D), spec2(D),
        pl.BlockSpec((nwords, D, Bt), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        spec2(_CI_ROWS), sym_spec, spec2(T),
    ]
    state_shapes = [
        jax.ShapeDtypeStruct((D, B), jnp.int32),
        jax.ShapeDtypeStruct((D, B), jnp.int32),
        jax.ShapeDtypeStruct((D, B), jnp.float32),
        jax.ShapeDtypeStruct((nwords, D, B), jnp.int32),
        jax.ShapeDtypeStruct((_CI_ROWS, B), jnp.int32),
        sym_shape,
        jax.ShapeDtypeStruct((T, B), jnp.int32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5 + state_specs,
        out_specs=state_specs,
        out_shape=state_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@functools.lru_cache(maxsize=None)
def _stack_mc_call(code: Code, B: int, Bt: int, channel: str, demapper: str,
                   interpret: bool):
    call = _stack_mc_pallas(code, B, Bt, channel, demapper, interpret)

    @jax.jit
    def step(iters, seed, param, fpl, lane0, state):
        out = call(iters, seed, param, fpl, lane0, *state)
        fin = (out[4][_ALLDN] > 0).astype(jnp.int32)
        return out, fin.sum()

    return step


def _init_state(code: Code, B: int, channel: str):
    T = code.num_block_symbols
    M = code.points_per_symbol
    D = STACK_DEPTH
    nwords = (T + 31) // 32
    soft = channel == "awgn"
    ci = jnp.zeros((_CI_ROWS, B), jnp.int32)
    ci = ci.at[_MDONE].set(1).at[_BANKED].set(1)
    syms = (jnp.zeros((T, M, B), jnp.float32) if soft
            else jnp.zeros((T, B), jnp.int32))
    return [jnp.zeros((D, B), jnp.int32),
            jnp.zeros((D, B), jnp.int32),
            jnp.zeros((D, B), jnp.float32),
            jnp.zeros((nwords, D, B), jnp.int32),
            ci, syms,
            jnp.zeros((T, B), jnp.int32)]


def auto_block_lanes(code: Code, lanes: int, channel: str) -> int:
    """Widest tile whose symbol plane stays comfortably in VMEM.  The
    stack micro-step is op-ISSUE-bound well past 128 lanes (its state
    planes are [64, Bt]), so wider tiles amortize the same ~constant op
    count over more lanes: measured k3 @ 8 dB 6.6e7 -> 1.37e8 bits/s from
    Bt 128 -> 1024 (PERF.md §3c).  Contrast fano, whose [T, Bt] node
    planes are element-bound at Bt=128 already."""
    T = code.num_block_symbols
    plane = T * (code.points_per_symbol if channel == "awgn" else 1) * 4
    bt = 1024
    while bt > 128 and plane * bt > (4 << 20):
        bt //= 2
    return min(lanes, bt)


def mc_stack(code: Code, lanes: int, frames_per_lane: int, seed, param,
             channel: str = "awgn", demapper: str = "soft",
             block_lanes: int = 0, max_calls: int = 1000000,
             lane0: int = 0, interpret: bool = False, _debug: bool = False):
    """Run ``lanes * frames_per_lane`` stack-decoded frames fully on-chip.

    Returns (bit_errors, frame_errors, bits) Python ints.  Per-frame
    searches are bit-exact vs ops/stack (tests); channel RNG is the
    coordinate hash (distribution-level, SURVEY §2e).  Dispatches are
    budget-bounded (backend watchdog, CLAUDE.md)."""
    import time as _time

    from convolutional_codes_tpu.ops.seq_chunking import _DISPATCH_BUDGET

    B = lanes
    Bt = block_lanes or auto_block_lanes(code, lanes, channel)
    if B % Bt:
        raise ValueError(f"lanes {B} not divisible by tile {Bt}")
    step = _stack_mc_call(code, B, Bt, channel, demapper, interpret)
    state = _init_state(code, B, channel)
    seed_a = jnp.asarray([int(seed) & 0x7FFFFFFF], jnp.int32)
    param_a = jnp.asarray([param], jnp.float32)
    fpl_a = jnp.asarray([frames_per_lane], jnp.int32)
    lane0_a = jnp.asarray([int(lane0)], jnp.int32)
    ntiles = B // Bt
    iters = max(_REFILL_EVERY * 4, min(8192, _DISPATCH_BUDGET // ntiles))
    for _ in range(max_calls):
        t0 = _time.time()
        state, nfin = step(jnp.asarray([iters], jnp.int32), seed_a, param_a,
                           fpl_a, lane0_a, state)
        state = list(state)
        nfin = int(nfin)
        if _debug:
            print(f"    [stack_mc] iters={iters} lanes_finished={nfin}/{B} "
                  f"dt={(_time.time()-t0)*1e3:.1f} ms", flush=True)
        if nfin == B:
            # host int64 reduce (see mc_fano: jnp dtype=int64 downcasts
            # with x64 disabled; cross-lane totals can exceed int32)
            ci = np.asarray(state[4])
            be = int(ci[_BERR].astype(np.int64).sum())
            fe = int(ci[_FERR].astype(np.int64).sum())
            return be, fe, B * frames_per_lane * code.block_length
        iters = min(iters * 2, max(_REFILL_EVERY,
                                   _DISPATCH_BUDGET // ntiles))
    raise RuntimeError("mc_stack: lanes still active after max_calls")


def stack_frames_host(code: Code, gids: np.ndarray, seed: int, param: float,
                      channel: str, demapper: str = "soft"):
    """The exact frames the kernel generates (ops/mc_datagen.frames_host)."""
    return frames_host(code, gids, seed, param, channel, demapper)
