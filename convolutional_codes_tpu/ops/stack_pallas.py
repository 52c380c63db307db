"""VMEM-resident Pallas kernel for the ZJ/stack sequential decoder.

Same per-frame serialization as :mod:`ops.stack` (which is bit-exact vs the
C reference, ``AWGN-channel/stack-decoder.c`` / the BSC variant) but the
entire 64-path search state lives in VMEM for a 128-lane frame tile, so one
microstep costs a handful of [64, 128] VPU ops instead of ~10 HBM-round-
tripping XLA gather/scatter dispatches.  Frames ride vector lanes; path
slots ride sublanes; every gather/scatter at the per-lane "best path" index
becomes a masked reduction / masked select over the 64 slot rows.

Reference semantics reproduced exactly (see ops/stack.py for citations):
  * first-max best-path selection, first-min worst-replacement at the
    64-path capacity (strict-compare scans in the C reference),
  * duplicate path written first (input 1, bit set), original path second
    (input 0) — so a self-replacement (all-equal metrics) keeps the
    duplicate's bit row, as in the XLA formulation,
  * soft metric ``1 + metric_weight * dist[esym]``, hard metric
    ``hamming*wrong + (symlen-hamming)*correct`` — hard metrics are
    integer-valued and exact in f32 (|metric| < 2^24), so one f32 kernel
    serves both modes with identical compare/tie behavior.

The decode is host-chunked: each kernel invocation runs at most ``iters``
microsteps (all state arrays round-trip through HBM between calls), so no
single device program exceeds the backend's tolerated runtime (CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from convolutional_codes_tpu.models.codebook import Code, PARITY_COMPAT
from convolutional_codes_tpu.models.trellis import quirk_mask_low
from convolutional_codes_tpu.ops.stack import STACK_DEPTH

_BIG = 3e38

#: ctl rows: 0=nstack, 1=widx, 2=done (i32 0/1)
_CTL_ROWS = 8

#: microsteps per all-done-guard evaluation inside the kernel loop
_CHUNK = 8


def _parity_u32(x):
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & np.uint32(1)


def _branch_consts(code: Code):
    K = code.constraint_length
    polys = [int(p) for p in code.polynomials]
    qmask = quirk_mask_low(K) if code.parity == PARITY_COMPAT else 0
    return K, polys, qmask


def _make_branch(code: Code):
    """branch(state_u32, input_bit) -> (next_state_u32, esym_u32), VPU ops
    only (dynamic state math — WSPR's 2^31 states rule out tables)."""
    K, polys, qmask = _branch_consts(code)

    def branch(s, inp: int):
        r = s | np.uint32(inp << (K - 1))
        sym = jnp.zeros_like(s)
        for p in polys:
            x = r & np.uint32(p)
            b = _parity_u32(x)
            if qmask:
                b = b & (np.uint32(1) - _parity_u32(x & np.uint32(qmask)))
            sym = (sym << 1) | b
        return r >> 1, sym

    return branch


def _stack_kernel(code: Code, T: int, Bt: int, soft: bool, nwords: int):
    D = STACK_DEPTH
    M = code.points_per_symbol
    symlen = code.symlen_out
    branch = _make_branch(code)
    if soft:
        w = float(code.metric_weight)
    else:
        correct, wrong = int(code.bit_metrics[0]), int(code.bit_metrics[1])

    def kernel(iters_ref, syms_ref,
               nii_in, st_in, met_in, bits_in, ctl_in,
               nii_ref, st_ref, met_ref, bits_ref, ctl_ref):
        slot2d = jax.lax.broadcasted_iota(jnp.int32, (D, Bt), 0)

        def first_of(pred2d):
            # smallest slot index where pred2d holds (per lane)
            cand = jnp.where(pred2d, slot2d, D)
            return jnp.min(cand, axis=0)

        # working state = output refs
        nii_ref[:] = nii_in[:]
        st_ref[:] = st_in[:]
        met_ref[:] = met_in[:]
        bits_ref[:] = bits_in[:]
        ctl_ref[:] = ctl_in[:]

        def micro():
                nii2d = nii_ref[:]
                met2d = met_ref[:]
                nstack = ctl_ref[0]
                widx = ctl_ref[1]
                done = ctl_ref[2] > 0

                live = slot2d < nstack[None, :]
                wm = jnp.where(live, met2d, -_BIG)
                mbest = jnp.max(wm, axis=0)
                cur = first_of(live & (met2d == mbest[None, :]))
                curmask = slot2d == cur[None, :]

                cur_nii = jnp.sum(jnp.where(curmask, nii2d, 0), axis=0)
                caught = cur_nii == widx

                # accept-next-symbol action (stack-decoder.c:133-136,174-194)
                finished = caught & (widx == T)
                advance = caught & (widx < T) & jnp.logical_not(done)
                ctl_ref[1] = jnp.where(advance, widx + 1, widx)
                done = done | finished
                ctl_ref[2] = done.astype(jnp.int32)

                # extension action (stack-decoder.c:138-171)
                # Phase chaining (round 5, see ops/stack_mc.py): a caught
                # lane's advance mutates nothing but widx, and the
                # reference then re-pops the SAME best node and extends
                # it — chaining that extension into this micro-step is
                # the exact two-iteration composition (bit-identical
                # counts; interpret + fuzz suites).
                ext = (jnp.logical_not(caught) | advance) \
                    & jnp.logical_not(done)
                s = jnp.sum(jnp.where(curmask, st_ref[:], 0),
                            axis=0).astype(jnp.uint32)
                m = jnp.sum(jnp.where(curmask, met2d, 0.0), axis=0)
                t = jnp.clip(cur_nii, 0, T - 1)
                ns0, e0 = branch(s, 0)
                ns1, e1 = branch(s, 1)

                if soft:
                    tmask = (jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0)
                             == t[None, :])[:, None, :]
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
                    tmask = (jax.lax.broadcasted_iota(jnp.int32, (T, Bt), 0)
                             == t[None, :])
                    rx = jnp.sum(jnp.where(tmask, syms_ref[:], 0),
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

                at_cap = nstack >= D
                mworst = jnp.min(jnp.where(live, met2d, _BIG), axis=0)
                worst = first_of(live & (met2d == mworst[None, :]))
                new = jnp.where(at_cap, worst, nstack)
                newmask = (slot2d == new[None, :]) & ext[None, :]
                curwr = curmask & ext[None, :]

                # duplicate (input 1) first — from the original's fields.
                # Alias corner (best slot == worst slot): reachable only
                # when ALL live metrics are exactly equal at capacity, so
                # first-max and first-min tie-scans pick the same slot.
                # The C reference then self-copies and extends that one
                # slot TWICE (input 1 then input 0 of the next symbol —
                # stack-decoder.c:138-171 with duplicate==original); here
                # the input-0 write wins (curwr below) and newonly keeps
                # the decoded-bit plane consistent with it, i.e. the
                # aliased slot holds one clean input-0 extension.  Never
                # observed in the 1e5+-frame differential fuzz vs the C
                # oracle; documented divergence rather than replicating
                # the double-extension in the hot micro-step.
                newonly = newmask & jnp.logical_not(curwr)
                bpos = (t & 31).astype(jnp.uint32)
                setbit = jnp.uint32(1) << bpos
                nii_new = (cur_nii + 1)[None, :]
                st1 = ns1.astype(jnp.int32)[None, :]
                met1 = (m + tm1)[None, :]
                for wd in range(nwords):
                    currow = jnp.sum(jnp.where(curmask, bits_ref[wd], 0),
                                     axis=0)
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

                ctl_ref[0] = jnp.where(ext & jnp.logical_not(at_cap),
                                       nstack + 1, nstack)

        # Guard per chunk of _CHUNK fully-masked microsteps: evaluating the
        # all-done reduction every microstep dominates runtime once a tile
        # finishes, and a done lane's microstep is a no-op (every write is
        # masked), so over-running by <= _CHUNK-1 steps is free.
        def chunk(_i, _c):
            @pl.when(jnp.logical_not(jnp.all(ctl_ref[2] > 0)))
            def _():
                for _ in range(_CHUNK):
                    micro()
            return _c

        jax.lax.fori_loop(0, iters_ref[0] // _CHUNK, chunk, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _stack_call(code: Code, T: int, B: int, Bt: int, soft: bool,
                interpret: bool):
    D = STACK_DEPTH
    M = code.points_per_symbol
    nwords = (T + 31) // 32
    kernel = _stack_kernel(code, T, Bt, soft, nwords)

    if soft:
        sym_spec = pl.BlockSpec((T, M, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    else:
        sym_spec = pl.BlockSpec((T, Bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

    def spec2(rows):
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def spec3(rows):
        return pl.BlockSpec((nwords, rows, Bt), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    state_specs = [spec2(D), spec2(D), spec2(D), spec3(D), spec2(_CTL_ROWS)]
    state_shapes = [
        jax.ShapeDtypeStruct((D, B), jnp.int32),
        jax.ShapeDtypeStruct((D, B), jnp.int32),
        jax.ShapeDtypeStruct((D, B), jnp.float32),
        jax.ShapeDtypeStruct((nwords, D, B), jnp.int32),
        jax.ShapeDtypeStruct((_CTL_ROWS, B), jnp.int32),
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


def pack_syms(code: Code, symbols: jnp.ndarray, soft: bool,
              Bp: int) -> jnp.ndarray:
    """[B, T, 2^m] distances (soft) / [B, T] symbols (hard) → lane-major
    kernel input padded to ``Bp`` lanes (shared with the fano kernel)."""
    B = symbols.shape[0]
    T = code.num_block_symbols
    if soft:
        syms = jnp.zeros((T, code.points_per_symbol, Bp), jnp.float32)
        return syms.at[:, :, :B].set(
            jnp.transpose(symbols.astype(jnp.float32), (1, 2, 0)))
    syms = jnp.zeros((T, Bp), jnp.int32)
    return syms.at[:, :B].set(symbols.astype(jnp.int32).T)


def _init_state(code: Code, B: int, valid: int):
    """Fresh decoder state, lanes >= ``valid`` pre-marked done (padding)."""
    T = code.num_block_symbols
    D = STACK_DEPTH
    nwords = (T + 31) // 32
    ctl = np.zeros((_CTL_ROWS, B), np.int32)
    ctl[0] = 1          # nstack
    ctl[1] = 1          # widx (first symbol accepted on entry, like stack.py)
    ctl[2, valid:] = 1  # pad lanes: done
    return (jnp.zeros((D, B), jnp.int32),
            jnp.zeros((D, B), jnp.int32),
            jnp.zeros((D, B), jnp.float32),
            jnp.zeros((nwords, D, B), jnp.int32),
            jnp.asarray(ctl))


@functools.partial(jax.jit, static_argnums=(0, 3))
def _extract(code: Code, met, bits, soft: bool, ctl):
    """Winning path per lane (first-max over live slots) → decoded bits."""
    D = STACK_DEPTH
    nstack = ctl[0]
    slot2d = jnp.arange(D)[:, None]
    live = slot2d < nstack[None, :]
    wm = jnp.where(live, met, -_BIG)
    mbest = jnp.max(wm, axis=0)
    cur = jnp.min(jnp.where(live & (met == mbest[None, :]),
                            slot2d, D), axis=0)
    B = met.shape[1]
    arange = jnp.arange(B)
    packed = bits[:, cur, arange]                       # [nwords, B]
    t_idx = jnp.arange(code.block_length)
    unpacked = (packed[t_idx >> 5, :].astype(jnp.uint32)
                >> (t_idx & 31)[:, None].astype(jnp.uint32)) & 1
    win = mbest if soft else mbest.astype(jnp.int32)
    return unpacked.T.astype(jnp.int32), win


def stack_decode_pallas(code: Code, symbols: jnp.ndarray, soft: bool,
                        block_lanes: int = 128,
                        iters_per_call: int = 1 << 22,
                        iters_first: int = 512,
                        max_calls: int = 10000,
                        interpret: bool = False,
                        with_metric: bool = False):
    """Stack decode via the VMEM kernel, host-chunked with lane compaction.

    symbols: ``[B, T, 2^m]`` f32 distances (soft) or ``[B, T]`` int (hard).
    Returns decoded ``[B, block_len]`` int32 bits (and the winning metric
    when ``with_metric``) — bit-identical to :func:`ops.stack.stack_decode_*`.
    """
    from convolutional_codes_tpu.ops.seq_chunking import chunked_lane_run

    B = symbols.shape[0]
    T = code.num_block_symbols
    Bt = block_lanes
    Bp = -(-B // Bt) * Bt

    syms = pack_syms(code, symbols, soft, Bp)
    state = chunked_lane_run(
        get_call=lambda b: _stack_call(code, T, b, Bt, soft, interpret),
        syms=syms, state=_init_state(code, Bp, B), done_sel=(4, 2),
        block_lanes=Bt, iters_first=iters_first, iters_cap=iters_per_call,
        max_calls=max_calls, what="stack_decode_pallas")

    bits, met = _extract(code, state[2], state[3], soft, state[4])
    bits = bits[:B]
    if with_metric:
        return bits, met[:B]
    return bits
