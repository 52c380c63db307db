"""Fused Fano Monte-Carlo kernel with in-kernel lane refill.

The production sweep path for the Fano decoder (the analogue of
ops/fused_chain.py for Viterbi): each VPU lane runs a sequence of
independent frames through the bit-exact Fano walk of ops/fano.py /
ops/fano_pallas.py, and when a lane's frame finishes it *banks its error
counts and generates its next frame inside the kernel* — RNG, encoder,
channel and demapper are coordinate-hash stages (ops/fused_longframe) —
instead of idling until a host compaction pass refills the tile
(ops/seq_chunking).  With ~hundreds of frames per lane the per-lane total
work concentrates around its mean, so the lockstep tile no longer pays the
max of 128 single-frame walks (VERDICT round 2, weak #2).

Second structural change vs ops/fano_pallas.py: per-field node gathers
and scatters are packed into single multi-plane masked ops ([5, T, B] /
[3, T, B] blocks) — on TPU the micro-step pays for op *issue count*, not
element count, so 7 gathers + 8 scatters become 2 + 3.  (A prior variant
that cached the current node in per-lane registers was SLOWER: it traded
few wide ops for many (1, B)-shaped ones, and issue overhead dominated.)
The per-frame serialization (and therefore the decoded output per frame)
is identical to the reference walk; tests cross-check error counts
against ops/fano.fano_decode_soft/_hard on host-replicated frames.

Reference: AWGN-channel/fano-decoder.c:150-265 and the BSC twin (drivers
main.c:80-144 / :57-98 for the surrounding chain).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.ops.fano import FANO_TIMEOUT, FANO_DELTA
from convolutional_codes_tpu.ops.mc_datagen import frames_host, make_datagen
from convolutional_codes_tpu.ops.stack_pallas import _make_branch

#: int32 control rows [per lane]
(_CUR, _TIMEOUT, _MODE, _MDONE, _BANKED, _FDONE, _BERR, _FERR,
 _ALLDN) = range(9)
_CI_ROWS = 16
#: f32 control rows
_THRESH = 0
_CF_ROWS = 8
#: int node-array planes [5, T, B] (same layout as ops/fano_pallas.py)
_NSTATE, _SUCC0, _SUCC1, _SELECTED, _DECODED = range(5)
#: f32 node-array planes [3, T, B]
_NMETRIC, _TM0, _TM1 = range(3)

#: micro-steps between refill checks; the refill block itself is gated
#: per chunk (stack_mc._refill_gate_div: any-lane for cheap datagen,
#: batched >= active/8 with a 4-chunk wait bound for soft M>=8), so a
#: finished lane idles at most a few chunks and quiet chunks cost two
#: scalar reduces
_REFILL_EVERY = 32

_FMAX = np.float32(3.4028235e38)


def _fano_mc_kernel(code: Code, T: int, L: int, Bt: int, channel: str,
                    demapper: str, timeout_per_bit: int):
    M = code.points_per_symbol
    symlen = code.symlen_out
    K = code.constraint_length
    branch = _make_branch(code)
    datagen = make_datagen(code, T, L, channel, demapper)
    delta = float(FANO_DELTA)
    soft = channel == "awgn"
    if soft:
        w = float(code.fano_metric_weight)
    else:
        correct = int(code.fano_bit_metrics[0])
        wrong = int(code.fano_bit_metrics[1])
    tpbT = int(timeout_per_bit) * T

    def kernel(iters_ref, seed_ref, param_ref, fpl_ref, lane0_ref,
               ni_in, nf_in, ci_in, cf_in, syms_in, bits_in,
               ni_ref, nf_ref, ci_ref, cf_ref, syms_ref, bits_ref):
        ni_ref[:] = ni_in[:]
        nf_ref[:] = nf_in[:]
        ci_ref[:] = ci_in[:]
        cf_ref[:] = cf_in[:]
        syms_ref[:] = syms_in[:]
        bits_ref[:] = bits_in[:]

        seed = seed_ref[0]
        param = param_ref[0]
        fpl = fpl_ref[0]          # frames per lane: dynamic, so one
                                  # executable serves every sweep tier
        row2d = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0)
        # lane0: global lane offset of this device's shard — under the
        # frames-axis shard_map (mc_fano_grid) each device covers a
        # distinct block of the SAME global lane/frame-id space, so a
        # sharded run is bit-identical to the serial same-seed run
        lane2d = (jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 1)
                  + Bt * pl.program_id(0) + lane0_ref[0])
        live2d = row2d < L

        def rowmask(idx):
            return row2d == idx[None, :]

        def g(plane, m):
            return jnp.sum(jnp.where(m, plane, 0), axis=0)

        def gf(plane, m):
            return jnp.sum(jnp.where(m, plane, 0.0), axis=0)

        def put(plane, sel, val):
            return jnp.where(sel, val[None, :], plane)

        def node_metrics(s_i32, m):
            """Sorted branch data at the row selected by mask ``m`` — the
            same computation as ops/fano_pallas.py (fano-decoder.c:160-181),
            incl. the pre-add product rounding."""
            s = s_i32.astype(jnp.uint32)
            ns0, e0 = branch(s, 0)
            ns1, e1 = branch(s, 1)
            if soft:
                trow = jnp.sum(jnp.where(m[:, None, :], syms_ref[:], 0.0),
                               axis=0)
                d0 = jnp.zeros((Bt,), jnp.float32)
                d1 = jnp.zeros((Bt,), jnp.float32)
                for e in range(M):
                    d0 = jnp.where(e0 == np.uint32(e), trow[e], d0)
                    d1 = jnp.where(e1 == np.uint32(e), trow[e], d1)
                tm0 = 1.0 + jnp.minimum(w * d0, _FMAX)
                tm1 = 1.0 + jnp.minimum(w * d1, _FMAX)
            else:
                rx = jnp.sum(jnp.where(m, syms_ref[:], 0),
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
            swap = tm0 < tm1            # strict: sorted best-first
            btm0 = jnp.where(swap, tm1, tm0)
            btm1 = jnp.where(swap, tm0, tm1)
            bs0 = jnp.where(swap, ns1, ns0).astype(jnp.int32)
            bs1 = jnp.where(swap, ns0, ns1).astype(jnp.int32)
            return bs0, bs1, btm0, btm1, swap.astype(jnp.int32)

        def micro():
            cur = ci_ref[_CUR]
            timeout = ci_ref[_TIMEOUT]
            mode = ci_ref[_MODE]
            mdone = ci_ref[_MDONE] > 0
            threshold = cf_ref[_THRESH]

            search = (mode == 0) & jnp.logical_not(mdone)

            # packed gathers at the current node: one masked reduce per
            # dtype block instead of one per field (op-issue count is what
            # the micro-step pays for on TPU, not element count)
            mc = rowmask(cur)
            gi = jnp.sum(jnp.where(mc[None, :, :], ni_ref[:], 0), axis=1)
            gv = jnp.sum(jnp.where(mc[None, :, :], nf_ref[:], 0.0), axis=1)
            sel = gi[_SELECTED]
            m_cur = gv[_NMETRIC]

            # ---- SEARCH head (fano-decoder.c:183-236) --------------------
            exhausted = search & (timeout == 0)
            act = search & jnp.logical_not(exhausted)
            timeout = jnp.where(act, timeout - 1, timeout)

            tsel = jnp.where(sel == 0, gv[_TM0], gv[_TM1])
            ms = m_cur + tsel
            fwd = act & (ms >= threshold)

            # threshold tightening: closed form of the += DELTA loop
            gate = fwd & (m_cur < threshold + delta)
            k = jnp.floor((ms - threshold) * (1.0 / delta)).astype(jnp.int32)
            k = jnp.where(ms >= threshold
                          + (k + 1).astype(jnp.float32) * delta, k + 1, k)
            k = jnp.where(ms < threshold + k.astype(jnp.float32) * delta,
                          k - 1, k)
            k = jnp.maximum(k, 0)
            threshold = jnp.where(
                gate, threshold + k.astype(jnp.float32) * delta, threshold)

            # forward move
            finished = fwd & (cur + 1 == T)
            step_fwd = fwd & jnp.logical_not(finished)
            ssel = jnp.where(sel == 0, gi[_SUCC0], gi[_SUCC1])
            cur = jnp.where(step_fwd, cur + 1, cur)
            m2 = rowmask(cur)
            # target state: fresh successor for fwd lanes; for everyone
            # else m2 == mc, so the packed gather already has it
            tstate = jnp.where(step_fwd, ssel, gi[_NSTATE])
            b0, b1, bt0, bt1, bdec = node_metrics(tstate, m2)
            wf = m2 & step_fwd[None, :]
            zero = jnp.zeros((Bt,), jnp.int32)
            vi = jnp.stack([tstate, b0, b1, zero, bdec])        # [5, Bt]
            ni_ref[:] = jnp.where(wf[None, :, :], vi[:, None, :], ni_ref[:])
            vf = jnp.stack([ms, bt0, bt1])                      # [3, Bt]
            nf_ref[:] = jnp.where(wf[None, :, :], vf[:, None, :], nf_ref[:])

            # no forward: enter backtrack mode
            mode = jnp.where(act & jnp.logical_not(fwd), 1, mode)

            # ---- BACKTRACK step (fano-decoder.c:237-264) -----------------
            # Phase chaining (round 5): ``back`` is computed from the
            # *post-search* mode, so a search-fail lane runs its first
            # backtrack step in the SAME micro-step — the composition is
            # exactly the two sequential reference steps (disjoint from
            # fwd lanes; cur/sel/threshold unchanged by the search head
            # for a failed lane), so the walk stays bit-identical while
            # the dominant quicksand cycle (fail -> relax) costs one
            # issued op group instead of two.  Counts-equality pinned by
            # tests/test_fano_mc.py + the hardware probes.
            # (CONVCODES_NO_CHAIN=1 restores the entry-mode mask for A/B
            # timing — identical counters either way.)
            from convolutional_codes_tpu.ops.stack_mc import _no_chain
            if _no_chain():
                back = (ci_ref[_MODE] == 1) & jnp.logical_not(mdone)
            else:
                back = (mode == 1) & jnp.logical_not(mdone)
            prev_ok = back & (cur > 0)
            mprev = rowmask(jnp.clip(cur - 1, 0, T - 1))
            pm = jnp.sum(jnp.where(mprev, nf_ref[_NMETRIC], 0.0), axis=0)
            can_back = prev_ok & (pm >= threshold)
            relax = back & jnp.logical_not(can_back)
            threshold = jnp.where(relax, threshold - delta, threshold)
            flip_relax = relax & (sel != 0)
            # move back one node; take its second branch if untested
            cur = jnp.where(can_back, cur - 1, cur)
            cb = can_back[None, :]
            m3 = (mprev & cb) | (m2 & jnp.logical_not(cb))
            g3 = jnp.sum(jnp.where(m3[None, :, :], ni_ref[:], 0), axis=1)
            take_second = can_back & (g3[_SELECTED] == 0)
            mode = jnp.where(relax | take_second, 0, mode)

            # combined dynamic write: relax lanes reset {sel, dec} at their
            # node; take_second lanes flip {sel, dec} at the node they
            # backed into — disjoint lanes, one packed masked store with
            # self-valued rows for the untouched planes
            one = jnp.ones((Bt,), jnp.int32)
            v_sel = jnp.where(take_second, one, zero)
            v_dec = jnp.where(take_second, g3[_DECODED] ^ 1,
                              gi[_DECODED] ^ 1)
            keep0 = jnp.where(take_second, g3[_NSTATE], gi[_NSTATE])
            keep1 = jnp.where(take_second, g3[_SUCC0], gi[_SUCC0])
            keep2 = jnp.where(take_second, g3[_SUCC1], gi[_SUCC1])
            vdyn = jnp.stack([keep0, keep1, keep2, v_sel, v_dec])
            wdyn = ((m2 & flip_relax[None, :])
                    | (m3 & take_second[None, :]))
            ni_ref[:] = jnp.where(wdyn[None, :, :], vdyn[:, None, :],
                                  ni_ref[:])

            mdone = mdone | finished | exhausted
            ci_ref[_CUR] = cur
            ci_ref[_TIMEOUT] = timeout
            ci_ref[_MODE] = mode
            ci_ref[_MDONE] = mdone.astype(jnp.int32)
            cf_ref[_THRESH] = threshold

        def refill():
            """Bank finished frames' error counts; generate fresh frames
            for lanes with budget left (fused_chain-style hash stages)."""
            mdone = ci_ref[_MDONE] > 0
            banked = ci_ref[_BANKED] > 0
            fdone = ci_ref[_FDONE]
            bank = mdone & jnp.logical_not(banked)

            # error counting over the payload rows
            mism = ((ni_ref[_DECODED] != bits_ref[:])
                    & live2d & bank[None, :])
            errs = jnp.sum(mism.astype(jnp.int32), axis=0)
            ci_ref[_BERR] = ci_ref[_BERR] + errs
            ci_ref[_FERR] = ci_ref[_FERR] + (bank & (errs > 0)).astype(jnp.int32)
            fdone = fdone + bank.astype(jnp.int32)
            banked = banked | bank

            regen = mdone & banked & (fdone < fpl)
            # ---- datagen for regen lanes (full-width, masked select) -----
            gid2d = lane2d * fpl + fdone[None, :]
            newbits, newsyms = datagen(gid2d, row2d, seed, param,
                                       taxis=0, stack_axis=1)
            bits_ref[:] = jnp.where(regen[None, :], newbits, bits_ref[:])
            if soft:
                syms_ref[:] = jnp.where(regen[None, None, :], newsyms,
                                        syms_ref[:])
            else:
                syms_ref[:] = jnp.where(regen[None, :], newsyms, syms_ref[:])

            # ---- machine reset at node 0 (matches ops/fano._fano_parts) --
            rg = regen[None, :]
            # zero the dynamic planes (SELECTED, DECODED) for regen lanes:
            # nodes beyond the deepest visit must read decoded = 0
            plane_dyn = (jax.lax.broadcasted_iota(jnp.int32, (5, T, Bt), 0)
                         >= _SELECTED)
            ni_ref[:] = jnp.where(plane_dyn & rg[None, :, :], 0, ni_ref[:])
            zl = jnp.zeros((Bt,), jnp.int32)
            m0 = rowmask(zl)
            b0, b1, bt0, bt1, bdec = node_metrics(zl, m0)
            w0 = m0 & regen[None, :]
            vi = jnp.stack([zl, b0, b1, zl, bdec])
            ni_ref[:] = jnp.where(w0[None, :, :], vi[:, None, :], ni_ref[:])
            vf = jnp.stack([jnp.zeros((Bt,), jnp.float32), bt0, bt1])
            nf_ref[:] = jnp.where(w0[None, :, :], vf[:, None, :], nf_ref[:])
            ci_ref[_CUR] = jnp.where(regen, 0, ci_ref[_CUR])
            ci_ref[_TIMEOUT] = jnp.where(regen, tpbT, ci_ref[_TIMEOUT])
            ci_ref[_MODE] = jnp.where(regen, 0, ci_ref[_MODE])
            ci_ref[_MDONE] = jnp.where(regen, 0, ci_ref[_MDONE])
            cf_ref[_THRESH] = jnp.where(regen, 0.0, cf_ref[_THRESH])
            ci_ref[_BANKED] = (banked & jnp.logical_not(regen)).astype(jnp.int32)
            ci_ref[_FDONE] = fdone
            ci_ref[_ALLDN] = (fdone >= fpl).astype(jnp.int32)

        from convolutional_codes_tpu.ops.stack_mc import (
            _REFILL_WAIT, _refill_gate_div)
        gd = _refill_gate_div(soft, M)

        def chunk(_i, since):
            # fire the refill once enough lanes finished a frame (bank
            # pending) or have budget left to start one — incl. the very
            # first fill (init state is mdone=1, banked=1, fdone=0).
            # Batched gate (stack_mc._refill_gate_div): for fat-datagen
            # configs (soft M>=8) the full-width datagen only fires once
            # >= active/div lanes wait (bounded by _REFILL_WAIT chunks),
            # so it stops regenerating the whole tile to serve one lane;
            # counters bit-identical for any divisor.  ``since`` rides
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
def _fano_mc_pallas(code: Code, B: int, Bt: int, channel: str, demapper: str,
                    timeout_per_bit: int, interpret: bool):
    """The raw pallas_call over ``B`` lanes (``B`` is the *local* lane count
    when the call runs under a shard_map — parallel/seq_grid.py)."""
    T = code.num_block_symbols
    L = code.block_length
    M = code.points_per_symbol
    soft = channel == "awgn"
    kernel = _fano_mc_kernel(code, T, L, Bt, channel, demapper,
                             timeout_per_bit)

    if soft:
        sym_spec = pl.BlockSpec((T, M, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        sym_shape = jax.ShapeDtypeStruct((T, M, B), jnp.float32)
    else:
        sym_spec = pl.BlockSpec((T, Bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        sym_shape = jax.ShapeDtypeStruct((T, B), jnp.int32)
    bit_spec = pl.BlockSpec((T, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    state_specs = [
        pl.BlockSpec((5, T, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, T, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((_CI_ROWS, Bt), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_CF_ROWS, Bt), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        sym_spec, bit_spec,
    ]
    state_shapes = [
        jax.ShapeDtypeStruct((5, T, B), jnp.int32),
        jax.ShapeDtypeStruct((3, T, B), jnp.float32),
        jax.ShapeDtypeStruct((_CI_ROWS, B), jnp.int32),
        jax.ShapeDtypeStruct((_CF_ROWS, B), jnp.float32),
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
            # big-T codes (K=15 + 16-QAM: [T=214, M=16, Bt] blocks) exceed
            # the 16 MiB default scoped VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
    )


@functools.lru_cache(maxsize=None)
def _fano_mc_call(code: Code, B: int, Bt: int, channel: str, demapper: str,
                  timeout_per_bit: int, interpret: bool):
    call = _fano_mc_pallas(code, B, Bt, channel, demapper, timeout_per_bit,
                           interpret)

    @jax.jit
    def step(iters, seed, param, fpl, lane0, state):
        out = call(iters, seed, param, fpl, lane0, *state)
        fin = (out[2][_ALLDN] > 0).astype(jnp.int32)
        return out, fin.sum()

    return step


def _init_state(code: Code, B: int, channel: str):
    T = code.num_block_symbols
    M = code.points_per_symbol
    soft = channel == "awgn"
    ci = jnp.zeros((_CI_ROWS, B), jnp.int32)
    ci = ci.at[_MDONE].set(1).at[_BANKED].set(1)
    if soft:
        syms = jnp.zeros((T, M, B), jnp.float32)
    else:
        syms = jnp.zeros((T, B), jnp.int32)
    return [jnp.zeros((5, T, B), jnp.int32),
            jnp.zeros((3, T, B), jnp.float32),
            ci,
            jnp.zeros((_CF_ROWS, B), jnp.float32),
            syms,
            jnp.zeros((T, B), jnp.int32)]


def mc_fano(code: Code, lanes: int, frames_per_lane: int, seed, param,
            channel: str = "awgn", demapper: str = "soft",
            timeout_per_bit: int = FANO_TIMEOUT, block_lanes: int = 128,
            max_calls: int = 1000000, lane0: int = 0,
            interpret: bool = False, _debug: bool = False):
    """Run ``lanes * frames_per_lane`` Fano-decoded frames fully on-chip.

    Returns (bit_errors, frame_errors, bits) Python ints.  The walk per
    frame is bit-exact vs ops/fano (tests); the channel RNG is the
    coordinate hash (distribution-level, SURVEY §2e — same contract as the
    fused Viterbi chains).  Dispatch sizes ramp up to the
    ``seq_chunking._DISPATCH_BUDGET`` micro-step bound (backend watchdog,
    CLAUDE.md).
    """
    import time as _time

    B = lanes
    Bt = block_lanes
    if B % Bt:
        raise ValueError(f"lanes {B} not divisible by tile {Bt}")
    step = _fano_mc_call(code, B, Bt, channel, demapper, timeout_per_bit,
                         interpret)
    state = _init_state(code, B, channel)
    seed_a = jnp.asarray([int(seed) & 0x7FFFFFFF], jnp.int32)
    param_a = jnp.asarray([param], jnp.float32)
    fpl_a = jnp.asarray([frames_per_lane], jnp.int32)
    lane0_a = jnp.asarray([int(lane0)], jnp.int32)
    ntiles = B // Bt
    # ramp like seq_chunking: small first dispatch, then budget-bounded
    from convolutional_codes_tpu.ops.seq_chunking import _DISPATCH_BUDGET
    iters = max(_REFILL_EVERY * 4, min(8192, _DISPATCH_BUDGET // ntiles))
    for _ in range(max_calls):
        t0 = _time.time()
        state, nfin = step(jnp.asarray([iters], jnp.int32), seed_a, param_a,
                           fpl_a, lane0_a, state)
        state = list(state)
        nfin = int(nfin)
        if _debug:
            print(f"    [fano_mc] iters={iters} lanes_finished={nfin}/{B} "
                  f"dt={( _time.time()-t0)*1e3:.1f} ms", flush=True)
        if nfin == B:
            # reduce on host in int64: per-lane counters are int32 (fine —
            # a lane cannot exceed 2^31 errors) but the cross-lane sum can
            # overflow int32 at large lanes*frames_per_lane, and jnp's
            # dtype=int64 silently downcasts with x64 disabled
            ci = np.asarray(state[2])
            be = int(ci[_BERR].astype(np.int64).sum())
            fe = int(ci[_FERR].astype(np.int64).sum())
            return be, fe, B * frames_per_lane * code.block_length
        iters = min(iters * 2, max(_REFILL_EVERY,
                                   _DISPATCH_BUDGET // ntiles))
    raise RuntimeError("mc_fano: lanes still active after max_calls")


# ---------------------------------------------------------------------------
# Host replica for validation (same hash stages, XLA ops)
# ---------------------------------------------------------------------------

def fano_frames_host(code: Code, gids: np.ndarray, seed: int, param: float,
                     channel: str, demapper: str = "soft"):
    """Rebuild the exact (bits, symbols) the kernel generates for global
    frame ids ``gids`` (ops/mc_datagen.frames_host) — tests decode them
    with ops/fano.fano_decode_soft/_hard and compare error counts."""
    return frames_host(code, gids, seed, param, channel, demapper)
