"""VMEM-resident Pallas kernel for the Fano sequential decoder.

Same per-frame micro-step serialization as :mod:`ops.fano` (bit-exact vs
the C reference ``AWGN-channel/fano-decoder.c`` / the BSC variant, see the
citations there), but the whole per-frame machine — node arrays
[T x {state, metric, sorted successors/branch metrics, selected, decoded}]
plus the {cur, threshold, timeout, mode} registers — lives in VMEM for a
128-lane frame tile.  One micro-step is ~30 [T, 128] VPU ops instead of
~20 HBM-round-tripping XLA gathers/scatters, which is what made the XLA
lockstep machine slower than one 2013-class CPU core (VERDICT round 1).

Per-lane node indexing (the reference walks a single path pointer) maps to
masked reductions (gather at ``cur``) and masked selects (scatter at
``cur``/``cur+1``) over the T node rows.

Metrics are f32 for both modes: hard Fano metrics are integer-valued with
|metric| far below 2^24, so f32 compares/adds are exact and the
threshold-tightening closed form (floor-divide by DELTA with two rounding
corrections) stays exact, as in the XLA soft path.

The decode is host-chunked: each invocation runs at most ``iters``
micro-steps (machine state round-trips through HBM between calls), keeping
every device program bounded (CLAUDE.md backend watchdog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.ops.fano import FANO_TIMEOUT, FANO_DELTA, _fano_parts
from convolutional_codes_tpu.ops.stack_pallas import _make_branch

#: node-array row blocks in the packed int32 state [5, T, B]
_NSTATE, _SUCC0, _SUCC1, _SELECTED, _DECODED = range(5)
#: node-array row blocks in the packed f32 state [3, T, B]
_NMETRIC, _TM0, _TM1 = range(3)
#: ctl_i rows: cur, timeout, mode (0=search, 1=backtrack), done
_CUR, _TIMEOUT, _MODE, _DONE = range(4)
_CTL_ROWS = 8

#: microsteps per all-done-guard evaluation inside the kernel loop
_CHUNK = 8


def _fano_kernel(code: Code, T: int, Bt: int, soft: bool):
    M = code.points_per_symbol
    symlen = code.symlen_out
    branch = _make_branch(code)
    delta = float(FANO_DELTA)
    if soft:
        w = float(code.fano_metric_weight)
    else:
        correct = int(code.fano_bit_metrics[0])
        wrong = int(code.fano_bit_metrics[1])

    def kernel(iters_ref, syms_ref, ni_in, nf_in, ci_in, cf_in,
               ni_ref, nf_ref, ci_ref, cf_ref):
        ni_ref[:] = ni_in[:]
        nf_ref[:] = nf_in[:]
        ci_ref[:] = ci_in[:]
        cf_ref[:] = cf_in[:]

        row2d = jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0)

        # every gather/scatter at a per-lane node index is a masked
        # reduction / select over the T rows; the (T, Bt) row masks are
        # built once per index value and shared across all fields
        def rowmask(idx):
            return row2d == idx[None, :]

        def g(arr2d, m):
            """arr2d[idx[lane], lane] per lane — masked row reduction."""
            return jnp.sum(jnp.where(m, arr2d, 0), axis=0)

        def gf(arr2d, m):
            return jnp.sum(jnp.where(m, arr2d, 0.0), axis=0)

        def put(arr2d, sel, val):
            """sel = rowmask & lane-mask, precombined by the caller."""
            return jnp.where(sel, val[None, :], arr2d)

        def node_metrics(s_i32, m):
            """Sorted branch data at the per-lane node selected by row mask
            ``m`` (state s).  Mirrors ops/fano.py node_metrics
            (fano-decoder.c:160-181)."""
            s = s_i32.astype(jnp.uint32)
            ns0, e0 = branch(s, 0)
            ns1, e1 = branch(s, 1)
            if soft:
                tmask = m[:, None, :]
                trow = jnp.sum(jnp.where(tmask, syms_ref[:], 0.0), axis=0)
                d0 = jnp.zeros((Bt,), jnp.float32)
                d1 = jnp.zeros((Bt,), jnp.float32)
                for e in range(M):
                    d0 = jnp.where(e0 == np.uint32(e), trow[e], d0)
                    d1 = jnp.where(e1 == np.uint32(e), trow[e], d1)
                # round the product before the add (spec semantics,
                # not FMA — see sequential_common.force_rounded)
                tm0 = 1.0 + jnp.minimum(w * d0, np.float32(3.4028235e38))
                tm1 = 1.0 + jnp.minimum(w * d1, np.float32(3.4028235e38))
            else:
                rx = jnp.sum(jnp.where(m, syms_ref[:], 0),
                             axis=0).astype(jnp.uint32)
                x0 = e0 ^ rx
                x1 = e1 ^ rx
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
                done = ci_ref[_DONE] > 0
                threshold = cf_ref[0]

                search = (mode == 0) & jnp.logical_not(done)

                # ---- SEARCH micro-step (fano-decoder.c:183-236) ----------
                exhausted = search & (timeout == 0)
                done = done | exhausted
                act = search & jnp.logical_not(exhausted)
                timeout = jnp.where(act, timeout - 1, timeout)

                mc = rowmask(cur)                     # pre-move node mask
                sel = g(ni_ref[_SELECTED], mc)
                m_cur = gf(nf_ref[_NMETRIC], mc)
                tsel = jnp.where(sel == 0, gf(nf_ref[_TM0], mc),
                                 gf(nf_ref[_TM1], mc))
                ms = m_cur + tsel
                fwd = act & (ms >= threshold)

                # threshold tightening: closed form of the += DELTA loop
                gate = fwd & (m_cur < threshold + delta)
                k = jnp.floor((ms - threshold) * (1.0 / delta)).astype(jnp.int32)
                k = jnp.where(ms >= threshold + (k + 1).astype(jnp.float32) * delta,
                              k + 1, k)
                k = jnp.where(ms < threshold + k.astype(jnp.float32) * delta,
                              k - 1, k)
                k = jnp.maximum(k, 0)
                threshold = jnp.where(
                    gate, threshold + k.astype(jnp.float32) * delta, threshold)

                # forward move
                nxt = jnp.clip(cur + 1, 0, T - 1)
                finished = fwd & (cur + 1 == T)
                done = done | finished
                step_fwd = fwd & jnp.logical_not(finished)
                ssel = jnp.where(sel == 0, g(ni_ref[_SUCC0], mc),
                                 g(ni_ref[_SUCC1], mc))
                cur = jnp.where(step_fwd, nxt, cur)
                m2 = rowmask(cur)                     # post-move node mask
                wf = m2 & step_fwd[None, :]           # write mask at new node
                ni_ref[_NSTATE] = put(ni_ref[_NSTATE], wf, ssel)
                nf_ref[_NMETRIC] = put(nf_ref[_NMETRIC], wf, ms)
                # recompute branch data at the node we just entered
                b0, b1, bt0, bt1, bdec = node_metrics(g(ni_ref[_NSTATE], m2),
                                                      m2)
                ni_ref[_SUCC0] = put(ni_ref[_SUCC0], wf, b0)
                ni_ref[_SUCC1] = put(ni_ref[_SUCC1], wf, b1)
                nf_ref[_TM0] = put(nf_ref[_TM0], wf, bt0)
                nf_ref[_TM1] = put(nf_ref[_TM1], wf, bt1)
                ni_ref[_DECODED] = put(ni_ref[_DECODED], wf, bdec)
                zero = jnp.zeros((Bt,), jnp.int32)
                ni_ref[_SELECTED] = put(ni_ref[_SELECTED], wf, zero)

                # no forward: enter backtrack mode
                mode = jnp.where(act & jnp.logical_not(fwd), 1, mode)

                # ---- BACKTRACK micro-step (fano-decoder.c:237-264) -------
                # (back lanes did not move above, so m2 is their node mask)
                # Phase chaining (round 5, see ops/fano_mc.py): ``back``
                # uses the post-search mode so a search-fail lane runs
                # its first backtrack step in the same micro-step —
                # bit-identical walk, half the micro-steps on the
                # dominant fail->relax cycle.
                back = (mode == 1) & jnp.logical_not(done)
                prev_ok = back & (cur > 0)
                mprev = rowmask(jnp.clip(cur - 1, 0, T - 1))
                pm = gf(nf_ref[_NMETRIC], mprev)
                can_back = prev_ok & (pm >= threshold)
                relax = back & jnp.logical_not(can_back)
                threshold = jnp.where(relax, threshold - delta, threshold)
                sel_cur = g(ni_ref[_SELECTED], m2)
                flip_relax = relax & (sel_cur != 0)
                wr = m2 & flip_relax[None, :]
                ni_ref[_DECODED] = put(ni_ref[_DECODED], wr,
                                       g(ni_ref[_DECODED], m2) ^ 1)
                ni_ref[_SELECTED] = put(ni_ref[_SELECTED], wr, zero)
                mode = jnp.where(relax, 0, mode)
                # move back one node; take its second branch if untested
                cur = jnp.where(can_back, cur - 1, cur)
                # (select between bool masks via logic ops — Mosaic rejects
                # i1-result select/trunc)
                cb = can_back[None, :]
                m3 = (mprev & cb) | (m2 & jnp.logical_not(cb))
                sel_b = g(ni_ref[_SELECTED], m3)
                take_second = can_back & (sel_b == 0)
                wt = m3 & take_second[None, :]
                ni_ref[_DECODED] = put(ni_ref[_DECODED], wt,
                                       g(ni_ref[_DECODED], m3) ^ 1)
                one = jnp.ones((Bt,), jnp.int32)
                ni_ref[_SELECTED] = put(ni_ref[_SELECTED], wt, one)
                mode = jnp.where(take_second, 0, mode)
                # if selected was already 1, stay in BACKTRACK, keep moving

                ci_ref[_CUR] = cur
                ci_ref[_TIMEOUT] = timeout
                ci_ref[_MODE] = mode
                ci_ref[_DONE] = done.astype(jnp.int32)
                cf_ref[0] = threshold

        # Guard per chunk of _CHUNK fully-masked microsteps (see
        # stack_pallas.py — per-microstep guards dominate once a tile is
        # done; done-lane microsteps are no-ops, so over-run is free).
        def chunk(_i, _c):
            @pl.when(jnp.logical_not(jnp.all(ci_ref[_DONE] > 0)))
            def _():
                for _ in range(_CHUNK):
                    micro()
            return _c

        jax.lax.fori_loop(0, iters_ref[0] // _CHUNK, chunk, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _fano_call(code: Code, T: int, B: int, Bt: int, soft: bool,
               interpret: bool):
    M = code.points_per_symbol
    kernel = _fano_kernel(code, T, Bt, soft)

    if soft:
        sym_spec = pl.BlockSpec((T, M, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    else:
        sym_spec = pl.BlockSpec((T, Bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

    state_specs = [
        pl.BlockSpec((5, T, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, T, Bt), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((_CTL_ROWS, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((_CTL_ROWS, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    state_shapes = [
        jax.ShapeDtypeStruct((5, T, B), jnp.int32),
        jax.ShapeDtypeStruct((3, T, B), jnp.float32),
        jax.ShapeDtypeStruct((_CTL_ROWS, B), jnp.int32),
        jax.ShapeDtypeStruct((_CTL_ROWS, B), jnp.float32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=(B // Bt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), sym_spec] + state_specs,
        out_specs=state_specs,
        out_shape=state_shapes,
        interpret=interpret,
    )
    return jax.jit(lambda iters, syms, state: call(iters, syms, *state))


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _pack_init(code: Code, symbols, soft: bool, timeout_per_bit: int, Bp: int):
    """Initial machine state in kernel layout, built by the (golden-exact)
    XLA initializer and transposed to lane-major; lanes >= B are padding
    and pre-marked done."""
    B = symbols.shape[0]
    carry, _, _ = _fano_parts(code, symbols, soft, timeout_per_bit)
    (nstate, nmetric, succ0, succ1, tm0, tm1, selected, decoded,
     cur, threshold, timeout, mode, done) = carry

    def lane(x, dtype):
        out = jnp.zeros((Bp,) + x.shape[1:], dtype)
        return out.at[:B].set(x.astype(dtype)).T

    ni = jnp.stack([lane(nstate, jnp.int32), lane(succ0, jnp.int32),
                    lane(succ1, jnp.int32), lane(selected, jnp.int32),
                    lane(decoded, jnp.int32)])
    nf = jnp.stack([lane(nmetric, jnp.float32), lane(tm0, jnp.float32),
                    lane(tm1, jnp.float32)])
    ci = jnp.zeros((_CTL_ROWS, Bp), jnp.int32)
    ci = ci.at[_CUR, :B].set(cur.astype(jnp.int32))
    ci = ci.at[_TIMEOUT, :B].set(timeout.astype(jnp.int32))
    ci = ci.at[_MODE, :B].set(mode.astype(jnp.int32))
    ci = ci.at[_DONE].set(jnp.ones((Bp,), jnp.int32)
                          .at[:B].set(done.astype(jnp.int32)))
    cf = jnp.zeros((_CTL_ROWS, Bp), jnp.float32)
    cf = cf.at[0, :B].set(threshold.astype(jnp.float32))
    return ni, nf, ci, cf


def fano_decode_pallas(code: Code, symbols: jnp.ndarray, soft: bool,
                       timeout_per_bit: int = FANO_TIMEOUT,
                       block_lanes: int = 128,
                       iters_per_call: int = 1 << 22,
                       iters_first: int = 512,
                       max_calls: int = 1000000,
                       interpret: bool = False,
                       with_diag: bool = False):
    """Fano decode via the VMEM kernel, host-chunked with lane compaction.

    symbols: ``[B, T, 2^m]`` f32 distances (soft) or ``[B, T]`` int (hard).
    Bit-identical to :func:`ops.fano.fano_decode_soft` / ``_hard``.
    """
    from convolutional_codes_tpu.ops.seq_chunking import chunked_lane_run

    B = symbols.shape[0]
    T = code.num_block_symbols
    Bt = block_lanes
    Bp = -(-B // Bt) * Bt

    from convolutional_codes_tpu.ops.stack_pallas import pack_syms

    symbols = symbols.astype(jnp.float32 if soft else jnp.int32)
    syms = pack_syms(code, symbols, soft, Bp)
    state = chunked_lane_run(
        get_call=lambda b: _fano_call(code, T, b, Bt, soft, interpret),
        syms=syms, state=_pack_init(code, symbols, soft, timeout_per_bit, Bp),
        done_sel=(2, _DONE), block_lanes=Bt, iters_first=iters_first,
        iters_cap=iters_per_call, max_calls=max_calls,
        what="fano_decode_pallas")

    ni, nf, ci, cf = state
    bits = ni[_DECODED].T[:B, : code.block_length].astype(jnp.int32)
    if not with_diag:
        return bits
    cur = ci[_CUR, :B]
    metric = jnp.take_along_axis(nf[_NMETRIC].T[:B], cur[:, None], axis=1)[:, 0]
    diag = {
        "metric": metric,
        "timeout_left": ci[_TIMEOUT, :B],
        "depth": cur,
        "timed_out": ci[_TIMEOUT, :B] == 0,
    }
    return bits, diag
