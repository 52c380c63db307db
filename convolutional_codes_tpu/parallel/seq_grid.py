"""Sequential MC kernels (ops/fano_mc, ops/stack_mc) on the device mesh.

The reference's sequential decoders are single-threaded host loops
(AWGN-channel/{fano,stack}-decoder.c); their TPU production path is the
fused MC kernel with in-kernel lane refill.  This module puts those
kernels under a shard_map so the dominant-cost sweeps (SURVEY §2e data-
and sweep-parallel rows) use the whole slice:

  * the global lane set of each sweep point is split into contiguous
    per-device blocks, each kernel instance receiving a ``lane0`` offset
    so every device hashes a distinct block of the SAME global frame-id
    space — a sharded run is therefore **bit-identical** to the serial
    same-seed `mc_fano`/`mc_stack` run (tests/test_seq_grid.py), not just
    statistically equal;
  * R sweep points (same sample tier) run concurrently on ``ndev / R``
    devices each — seeds and channel parameters are plain per-device
    SMEM scalars, so one compiled executable serves every grouping.

Counters come back as per-lane planes; the host reduces them per point in
int64 (cross-lane totals can exceed int32).
"""

from __future__ import annotations

import time
from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.models.constellations import register_dependent_cache
from convolutional_codes_tpu.ops import fano_mc, stack_mc
from convolutional_codes_tpu.ops.fano import FANO_TIMEOUT
from convolutional_codes_tpu.ops.fano_mc import _REFILL_EVERY
from convolutional_codes_tpu.ops.seq_chunking import _DISPATCH_BUDGET


def _mod(decoder: str):
    if decoder == "fano":
        return fano_mc
    if decoder == "stack":
        return stack_mc
    raise ValueError(f"not a sequential decoder: {decoder!r}")


@lru_cache(maxsize=None)
def _seq_grid_step(decoder: str, code: Code, Bl: int, Bt: int, channel: str,
                   demapper: str, timeout_per_bit: int, interpret: bool,
                   mesh: Mesh):
    """One jitted mesh-wide dispatch of the per-device pallas call."""
    soft = channel == "awgn"
    if decoder == "fano":
        call = fano_mc._fano_mc_pallas(code, Bl, Bt, channel, demapper,
                                       timeout_per_bit, interpret)
        ci_idx, alldn = 2, fano_mc._ALLDN
        # state array ranks: nodes_i, nodes_f, ci, cf, syms, bits
        ndims = (3, 3, 2, 2, 3 if soft else 2, 2)
    else:
        call = stack_mc._stack_mc_pallas(code, Bl, Bt, channel, demapper,
                                         interpret)
        ci_idx, alldn = 4, stack_mc._ALLDN
        # nii, st, met, packed bits, ci, syms, tx
        ndims = (2, 2, 2, 3, 2, 3 if soft else 2, 2)

    axes = tuple(mesh.axis_names)
    # lane dim (always last) sharded over EVERY mesh axis, flattened in
    # axis order — sweep-major, frames-minor, matching the host's
    # contiguous per-point device grouping
    state_specs = tuple(P(*([None] * (nd - 1) + [axes])) for nd in ndims)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axes), P(axes), P(), P(axes)) + state_specs,
             out_specs=state_specs + (P(),), check_vma=False)
    def step(iters, seed, param, fpl, lane0, *state):
        out = call(iters, seed, param, fpl, lane0, *state)
        fin = (out[ci_idx][alldn] > 0).astype(jnp.int32).sum()
        return (*out, jax.lax.psum(fin, axes))

    return step, ci_idx


# the pallas calls embed the constellation tables
register_dependent_cache(_seq_grid_step.cache_clear)


def seq_mc_grid(decoder: str, code: Code, lanes: int, frames_per_lane: int,
                seeds: Sequence[int], params: Sequence[float], mesh: Mesh,
                channel: str = "awgn", demapper: str = "soft",
                timeout_per_bit: int = FANO_TIMEOUT, block_lanes: int = 0,
                max_calls: int = 1000000, interpret: bool = False,
                _debug: bool = False) -> Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """Run ``R = len(seeds)`` sequential sweep points across ``mesh``.

    ``lanes`` is the GLOBAL lane count per point; the mesh's devices split
    into R contiguous groups of ``ndev / R``, each device decoding
    ``lanes * frames_per_lane / (ndev / R)`` frames of its point's frame-id
    space.  Counters are bit-identical to R serial
    ``mc_fano/mc_stack(code, lanes, frames_per_lane, seeds[r], params[r])``
    runs.  Returns (bit_errors[R], frame_errors[R], bits[R]) int64 arrays.
    """
    mod = _mod(decoder)
    R = len(seeds)
    ndev = int(np.prod(list(mesh.shape.values())))
    if len(params) != R:
        raise ValueError("seeds/params length mismatch")
    if ndev % R:
        raise ValueError(f"{R} points do not divide {ndev} devices")
    dpp = ndev // R
    if lanes % dpp:
        raise ValueError(f"lanes {lanes} not divisible by {dpp} devices/point")
    Bl = lanes // dpp
    if not block_lanes:
        # stack is issue-bound → widest VMEM-safe tile; fano's [T, B] node
        # planes are element-bound at 128 (measured, PERF.md §3c)
        block_lanes = (stack_mc.auto_block_lanes(code, Bl, channel)
                       if decoder == "stack" else 128)
    Bt = min(block_lanes, Bl)
    if Bl % Bt:
        raise ValueError(f"per-device lanes {Bl} not divisible by tile {Bt}")

    step, ci_idx = _seq_grid_step(decoder, code, Bl, Bt, channel, demapper,
                                  timeout_per_bit, interpret, mesh)
    state = mod._init_state(code, ndev * Bl, channel)
    seed_dev = jnp.asarray(np.repeat(
        np.asarray([int(s) & 0x7FFFFFFF for s in seeds], np.int64),
        dpp).astype(np.int32))
    param_dev = jnp.asarray(np.repeat(np.asarray(params, np.float32), dpp))
    lane0_dev = jnp.asarray(np.tile(np.arange(dpp, dtype=np.int32) * Bl, R))
    fpl_a = jnp.asarray([frames_per_lane], jnp.int32)
    ntiles = Bl // Bt
    iters = max(_REFILL_EVERY * 4, min(8192, _DISPATCH_BUDGET // ntiles))
    for _ in range(max_calls):
        t0 = time.time()
        out = step(jnp.asarray([iters], jnp.int32), seed_dev, param_dev,
                   fpl_a, lane0_dev, *state)
        state = list(out[:-1])
        nfin = int(out[-1])
        if _debug:
            print(f"    [seq_grid/{decoder}] iters={iters} "
                  f"lanes_finished={nfin}/{ndev * Bl} "
                  f"dt={(time.time() - t0) * 1e3:.1f} ms", flush=True)
        if nfin == ndev * Bl:
            ci = np.asarray(state[ci_idx])
            be = ci[mod._BERR].astype(np.int64).reshape(R, dpp * Bl).sum(1)
            fe = ci[mod._FERR].astype(np.int64).reshape(R, dpp * Bl).sum(1)
            bits = np.full(R, lanes * frames_per_lane * code.block_length,
                           np.int64)
            return be, fe, bits
        iters = min(iters * 2, max(_REFILL_EVERY, _DISPATCH_BUDGET // ntiles))
    raise RuntimeError("seq_mc_grid: lanes still active after max_calls")
