"""Host-chunked fixed-shape runner + straggler pool for the sequential
Pallas decoder kernels (ops/stack_pallas.py, ops/fano_pallas.py).

The kernels advance 128-lane frame tiles in lockstep; a tile runs until its
slowest frame finishes.  Two wall-clock killers and their fixes:

* **Straggler spreading** — at moderate SNR >99% of frames finish within a
  few hundred microsteps while rare frames (deep backtracking /
  timeout-bound searches: a timed-out Fano frame burns budget ~ 10000 x
  block_len microsteps) run 1000x longer, and with stragglers scattered
  uniformly every tile pays the straggler price.  Fix: between bounded
  dispatches, **compact active lanes to the front of the buffer** — a tile
  whose lanes are all done reduces to its all-done guard (~0.3 us per
  8-microstep chunk, measured), so the wall-clock becomes
  (mean work x frames + one lockstep straggler tail), not
  (straggler tail x tile count).
* **Per-shape recompiles** — every distinct lane count is a separate
  executable, and kernel compiles on the tunneled backend cost seconds to
  minutes (CLAUDE.md).  So compaction never shrinks the buffer: arrays keep
  their padded size and one executable per (code, mode, batch) serves the
  whole sweep.

:class:`SequentialPool` extends this across batches: each submitted batch
runs only until its fast bulk is done (call budget), survivors accumulate
in a carry buffer that is decoded when full (or at flush) — so a whole
sweep point pays for one straggler tail, not one per batch.

Each device dispatch runs at most ``iters_cap`` microsteps per tile, so no
single device program exceeds the backend's tolerated runtime (CLAUDE.md
watchdog).
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

#: CONVCODES_SEQ_DEBUG=1 prints per-dispatch (iters, active lanes, wall).
_DEBUG = bool(os.environ.get("CONVCODES_SEQ_DEBUG"))


@jax.jit
def _reorder(arrs, idx):
    """Lane permutation of every state array in one dispatch."""
    return [jnp.take(a, idx, axis=-1) for a in arrs]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _status(done_row, Bt: int, ntiles: int):
    """(total active, per-tile active counts) — a tiny transfer instead of
    reading the whole done row back every dispatch."""
    active = (done_row == 0).astype(jnp.int32)
    per_tile = active.reshape(ntiles, Bt).sum(axis=1)
    return active.sum(), per_tile


@functools.lru_cache(maxsize=None)
def _with_status(call: Callable, ai: int, row: int, Bt: int, ntiles: int):
    """Kernel dispatch + status summary in ONE device program: the host
    loop then costs a single round-trip per dispatch (the tunneled
    backend's RTT dwarfs the status math)."""

    @jax.jit
    def step(iters, syms, state):
        out = call(iters, syms, state)
        active = (out[ai][row] == 0).astype(jnp.int32)
        return out, active.sum(), active.reshape(ntiles, Bt).sum(axis=1)

    return step


#: Target tile-microsteps per dispatch: at ~0.5 us per tile-microstep this
#: bounds a dispatch to ~2 s, far under the backend watchdog, while letting
#: a one-tile straggler tail run ~4M microsteps per dispatch instead of
#: paying ~5 ms of dispatch+sync overhead every few thousand.
_DISPATCH_BUDGET = 4 << 20


def compacting_run(
    call: Callable,
    syms: jnp.ndarray,
    state: Sequence[jnp.ndarray],
    done_sel: Tuple[int, int],
    block_lanes: int,
    iters_first: int,
    iters_cap: int,
    max_calls: int,
    what: str,
    perm: Optional[np.ndarray] = None,
    stop_when_nact_le: int = 0,
) -> Tuple[List[jnp.ndarray], jnp.ndarray, np.ndarray, np.ndarray]:
    """Advance all lanes until done (or ``nact <= stop_when_nact_le``).

    ``call(iters, syms, state)`` runs one bounded kernel dispatch; ``perm``
    maps buffer lane -> caller frame id (identity by default).  All shapes
    stay fixed; active lanes are stable-sorted to the front between
    dispatches.  Returns (state, syms, perm, done) — caller maps lane i's
    results back to frame ``perm[i]`` (and ignores pad lanes).
    """
    ai, row = done_sel
    Bt = block_lanes
    B = syms.shape[-1]
    ntiles = B // Bt
    if perm is None:
        perm = np.arange(B)
    state = list(state)
    # first dispatch budget-clamped too (all tiles potentially active)
    iters = max(Bt, min(iters_first, _DISPATCH_BUDGET // ntiles))
    step = _with_status(call, ai, row, Bt, ntiles)
    nact = int(_status(state[ai][row], Bt, ntiles)[0])
    for _ in range(max_calls):
        if nact == 0 or nact <= stop_when_nact_le:
            done = np.asarray(state[ai][row]) > 0
            return state, syms, perm, done
        it = jnp.asarray([iters], jnp.int32)
        t0 = time.time() if _DEBUG else 0.0
        state, nact_t, per_tile_t = step(it, syms, state)
        state = list(state)
        nact, per_tile = int(nact_t), np.asarray(per_tile_t)
        if _DEBUG:
            print(f"    [{what}] iters={iters} nact_after={nact} "
                  f"dt={(time.time() - t0) * 1e3:.1f} ms", flush=True)
        # front-compact (stable sort, fixed buffer size, one fused gather
        # dispatch) only when it reduces the number of active tiles
        active_tiles = int((per_tile > 0).sum())
        need_tiles = -(-nact // Bt)
        if nact and active_tiles > need_tiles:
            done = np.asarray(state[ai][row]) > 0
            order = np.argsort(done, kind="stable")
            idx = jnp.asarray(order)
            out = _reorder(state + [syms], idx)
            state, syms = out[:-1], out[-1]
            perm = perm[order]
            active_tiles = need_tiles
        # ramp the per-tile microstep budget: double each dispatch, and let
        # a thin straggler tail use the whole dispatch budget at once
        iters = max(iters, min(iters * 2, iters_cap,
                               _DISPATCH_BUDGET // max(active_tiles, 1)))
    if stop_when_nact_le > 0:
        # bounded-budget mode (pool submit): hand survivors back
        done = np.asarray(state[ai][row]) > 0
        return state, syms, perm, done
    raise RuntimeError(f"{what}: {nact} frames still active "
                       f"after {max_calls} dispatches")


def chunked_lane_run(
    get_call: Callable[[int], Callable],
    syms: jnp.ndarray,
    state: Sequence[jnp.ndarray],
    done_sel: Tuple[int, int],
    block_lanes: int,
    iters_first: int,
    iters_cap: int,
    max_calls: int,
    what: str,
) -> List[jnp.ndarray]:
    """Run every lane to completion and restore the original lane order."""
    B = syms.shape[-1]
    state, _, perm, _ = compacting_run(
        get_call(B), syms, state, done_sel, block_lanes,
        iters_first, iters_cap, max_calls, what)
    if not np.array_equal(perm, np.arange(B)):
        state = _reorder(state, jnp.asarray(np.argsort(perm, kind="stable")))
    return state


class SequentialPool:
    """Cross-batch straggler pool.

    Usage (one pool per sweep point)::

        pool = SequentialPool(machine)        # machine wraps one kernel cfg
        for batch:  pool.submit(syms_lane_major, state, frame_ids)
        finished = pool.flush()               # [(frame_ids, state), ...]

    ``submit`` advances the batch until at most ``carry_lanes`` survivors
    remain (within a bounded call budget), banks the finished lanes'
    results, and parks survivors in the carry buffer; a full carry buffer
    is decoded to completion immediately.  Results are reported through
    ``machine.collect(frame_ids, state_lane_indices, state)`` callbacks.
    """

    def __init__(self, call: Callable, done_sel: Tuple[int, int],
                 collect: Callable[[np.ndarray, np.ndarray, List[jnp.ndarray]], None],
                 block_lanes: int = 128,
                 iters_first: int = 512,
                 iters_cap: int = 1 << 22,
                 max_calls: int = 100000,
                 submit_calls: int = 6,
                 what: str = "sequential_pool"):
        self.call = call
        self.done_sel = done_sel
        self.collect = collect
        self.Bt = block_lanes
        self.iters_first = iters_first
        self.iters_cap = iters_cap
        self.max_calls = max_calls
        self.submit_calls = submit_calls
        self.what = what
        # parked survivors: lists of single-lane-group slices
        self._carry: List[Tuple[jnp.ndarray, List[jnp.ndarray], np.ndarray]] = []
        self._carry_lanes = 0
        self._width = 0     # submit batch width; carry runs reuse it so the
                            # whole point shares one kernel executable

    def _bank(self, state, perm, done_mask):
        """Report results for finished, non-pad lanes."""
        sel = done_mask & (perm >= 0)
        if sel.any():
            lanes = np.nonzero(sel)[0]
            self.collect(perm[lanes], lanes, state)

    def submit(self, syms: jnp.ndarray, state: Sequence[jnp.ndarray],
               frame_ids: np.ndarray) -> None:
        B = syms.shape[-1]
        if self._width and B != self._width:
            raise ValueError(f"pool width changed: {B} vs {self._width}")
        self._width = B
        perm = np.full(B, -1, np.int64)
        perm[: len(frame_ids)] = frame_ids
        state, syms, perm, done = compacting_run(
            self.call, syms, list(state), self.done_sel, self.Bt,
            self.iters_first, self.iters_cap, self.submit_calls,
            self.what, perm=perm, stop_when_nact_le=self.Bt)
        nact = int((~done & (perm >= 0)).sum())
        if nact > B // 2:
            # all-slow regime (e.g. timeout-bound low SNR): parking the
            # whole batch would just shuffle 10s of MB through gathers —
            # run it to completion in place instead
            state, syms, perm, done = compacting_run(
                self.call, syms, state, self.done_sel, self.Bt,
                self.iters_cap, self.iters_cap, self.max_calls,
                self.what + ".slow", perm=perm)
        self._bank(state, perm, done)
        act = np.nonzero(~done & (perm >= 0))[0]
        if len(act):
            idx = jnp.asarray(act)
            self._carry.append((jnp.take(syms, idx, axis=-1),
                                [jnp.take(a, idx, axis=-1) for a in state],
                                perm[act]))
            self._carry_lanes += len(act)
            if self._carry_lanes >= B:
                self._run_carry(B)

    def _run_carry(self, width: int) -> None:
        """Concatenate parked lanes and run them to completion in
        width-sized chunks (same executable as the submit runs)."""
        if not self._carry:
            return
        ai, row = self.done_sel
        syms = jnp.concatenate([c[0] for c in self._carry], axis=-1)
        state = [jnp.concatenate([c[1][i] for c in self._carry], axis=-1)
                 for i in range(len(self._carry[0][1]))]
        perm = np.concatenate([c[2] for c in self._carry])
        self._carry = []
        self._carry_lanes = 0
        n = syms.shape[-1]
        for lo in range(0, n, width):
            hi = min(lo + width, n)
            idx = jnp.asarray(
                np.concatenate([np.arange(lo, hi),
                                np.zeros(width - (hi - lo), np.int64)]))
            csyms = jnp.take(syms, idx, axis=-1)
            cstate = [jnp.take(a, idx, axis=-1) for a in state]
            cperm = np.concatenate(
                [perm[lo:hi], np.full(width - (hi - lo), -1, np.int64)])
            if hi - lo < width:   # pad lanes (lane-0 clones) forced done
                cstate[ai] = cstate[ai].at[row, hi - lo:].set(1)
            cstate, csyms, cperm, done = compacting_run(
                self.call, csyms, cstate, self.done_sel, self.Bt,
                max(self.iters_first, 8192), self.iters_cap, self.max_calls,
                self.what + ".carry", perm=cperm)
            self._bank(cstate, cperm, done)

    def flush(self) -> None:
        if self._carry:
            self._run_carry(self._width or self.Bt)
