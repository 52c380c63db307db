"""Streaming / long-frame Viterbi: time-block trellis partitioning.

The reference caps blocks at ~200 bits (uint8 lengths everywhere,
SURVEY.md §2d) and has no streaming mode.  This module decodes arbitrarily
long frames (e.g. the K=7 NASA-code config in BASELINE.json) by
partitioning the symbol stream into time blocks across a ``seq`` mesh axis
— the overlap-save scheme of parallel block-based Viterbi decoding:

  * each device receives its block plus a ``warmup``-symbol halo on both
    sides via ``ppermute`` neighbor exchange over ICI,
  * the left halo warms up the path metrics from a uniform start, so by the
    block's first real symbol they have converged to the monolithic
    decoder's metrics (up to a constant),
  * the right halo extends the trellis so the traceback has converged back
    onto the survivor path by the time it re-enters the block,
  * the first block instead starts exactly pinned to state 0 (its left halo
    branch metrics force the all-zero warmup path), and the last block
    starts its traceback at the true frame end.

With ``warmup`` ≳ 10 constraint lengths the result is bit-identical to a
monolithic decode with overwhelming probability (validated in tests);
boundary effects decay exponentially in the warmup length.
"""

from __future__ import annotations

import time
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.models.trellis import build_trellis
from convolutional_codes_tpu.ops.viterbi import acs_forward, traceback_from

#: Large-but-finite soft metric for "impossible" warmup branches.  Using a
#: finite value keeps every state's metric ordered (inf would poison frames
#: whose halo is discarded anyway) while dominating any real path cost.
_PIN = 1e9


def _pin_first_block_halo(dists_halo: jnp.ndarray) -> jnp.ndarray:
    """Branch metrics that force the all-zero path: distance 0 for symbol 0,
    _PIN otherwise.  After K-1 such steps the metric vector equals the
    state-0-pinned initial metrics up to paths costing >= _PIN."""
    out = jnp.full_like(dists_halo, _PIN)
    return out.at[..., 0].set(0.0)


def streaming_viterbi_decode(code: Code, dists: jnp.ndarray, mesh: Mesh,
                             warmup: int = 128, seq_axis: str = "seq",
                             backend: str = "auto", chunk: int = 128,
                             block_lanes: int = 512,
                             interpret: bool = False) -> jnp.ndarray:
    """Decode a long soft-demapped frame sharded over time blocks.

    Args:
      dists: ``[B, T, 2^m]`` distance stream, T divisible by the seq-axis
        size; sharded (or shardable) over axis 1.
      mesh: mesh containing ``seq_axis``.
      warmup: halo length W in symbols.
      backend: "pallas" runs each shard's forward pass in the VMEM ACS
        kernel (ops/viterbi_pallas) — the per-chip kernel under the
        cross-chip halo exchange; "xla" keeps the bandwidth-bound XLA
        scan; "auto" picks pallas on TPU (or with ``interpret``).

    Returns: ``[B, T]`` decoded bits (the caller strips the K-1 tail).
    """
    D = mesh.shape[seq_axis]
    B, T, M = dists.shape
    if T % D != 0:
        raise ValueError(f"frame length {T} not divisible by seq axis {D}")
    if backend == "auto":
        backend = ("pallas" if interpret or jax.default_backend() == "tpu"
                   else "xla")
    Tl = T // D
    if backend == "pallas" and ((warmup + Tl) % chunk or warmup % chunk):
        raise ValueError(f"pallas backend needs chunk {chunk} to divide "
                         f"both warmup {warmup} and warmup+block "
                         f"{warmup + Tl}")
    run = _streaming_fn(code, mesh, B, M, warmup, seq_axis, backend, chunk,
                        block_lanes, interpret)
    return run(dists)


@lru_cache(maxsize=None)
def _streaming_fn(code: Code, mesh: Mesh, B: int, M: int, W: int,
                  seq_axis: str, backend: str, chunk: int, block_lanes: int,
                  interpret: bool):
    """Cached jitted shard_map runner — a fresh closure per call would
    recompile every decode (~seconds over the tunneled backend)."""
    trellis = build_trellis(code)
    D = mesh.shape[seq_axis]
    use_pallas = backend == "pallas"

    spec_in = P(None, seq_axis, None)
    spec_out = P(None, seq_axis)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(spec_in,), out_specs=spec_out,
             check_vma=False)
    def run(local):                                   # [B, Tl, M]
        Tl = local.shape[1]
        idx = jax.lax.axis_index(seq_axis)
        # halo exchange over the ring (ICI neighbor traffic)
        right_edge = local[:, Tl - W:]                # sent rightward
        left_edge = local[:, :W]                      # sent leftward
        from_left = jax.lax.ppermute(
            right_edge, seq_axis, [(i, (i + 1) % D) for i in range(D)])
        from_right = jax.lax.ppermute(
            left_edge, seq_axis, [(i, (i - 1) % D) for i in range(D)])
        first = idx == 0
        last = idx == D - 1
        left_halo = jnp.where(first, _pin_first_block_halo(from_left), from_left)
        ext = jnp.concatenate([left_halo, local, from_right], axis=1)

        # Forward ACS over [W | Tl | W]; capture metrics at the true frame
        # end for the last block's traceback.
        if use_pallas:
            # one streaming-kernel dispatch per segment (metrics carried in
            # VMEM scratch across time chunks, blocks double-buffered by
            # the Pallas pipeline) — replaced the round-4 scan of per-chunk
            # kernel calls, which paid a multi-ms cost per scan step
            from convolutional_codes_tpu.ops.longframe_pallas import (
                stream_acs_pallas, stream_traceback_pallas)

            Bt = min(block_lanes, B)
            d_tmb = jnp.transpose(ext.astype(jnp.float32), (1, 2, 0))
            init = jnp.zeros((trellis.num_states, B), jnp.float32)
            mid_m, dec_a = stream_acs_pallas(trellis, d_tmb[: W + Tl], init,
                                             False, chunk, Bt, interpret)
            end_m, dec_b = stream_acs_pallas(trellis, d_tmb[W + Tl:], mid_m,
                                             False, chunk, Bt, interpret)
            mid_am = jnp.argmin(mid_m, axis=0).astype(jnp.int32)
            end_am = jnp.argmin(end_m, axis=0).astype(jnp.int32)
            # right-halo walk first: its carry state at index W+Tl replaces
            # the traceback_from(start_index=...) variable start — the last
            # device instead starts there directly from the true frame end
            _, cur_mid = stream_traceback_pallas(trellis, dec_b, end_am,
                                                 chunk, Bt, interpret)
            start_mid = jnp.where(last, mid_am, cur_mid).astype(jnp.int32)
            bits_tb, _ = stream_traceback_pallas(trellis, dec_a, start_mid,
                                                 chunk, Bt, interpret)
            return jnp.swapaxes(bits_tb[W: W + Tl], 0, 1)

        init = jnp.zeros((B, trellis.num_states), jnp.float32)
        mid_m, dec_a = acs_forward(trellis, ext[:, : W + Tl], False, init)
        end_m, dec_b = acs_forward(trellis, ext[:, W + Tl:], False, mid_m)
        decisions = jnp.concatenate([dec_a, dec_b], axis=0)
        mid_am = jnp.argmin(mid_m, axis=-1)
        end_am = jnp.argmin(end_m, axis=-1)

        start_state = jnp.where(last, mid_am, end_am).astype(jnp.int32)
        start_index = jnp.where(last, W + Tl, W + Tl + W)
        bits_ext = traceback_from(trellis, decisions, start_state,
                                  start_index=start_index)
        return bits_ext[:, W: W + Tl]

    return run


def long_frame_decode_pallas(code: Code, dists: jnp.ndarray,
                             chunk: int = 256, block_lanes: int = 512
                             ) -> jnp.ndarray:
    """Single-chip long-frame decode with bounded VMEM: scan over time
    chunks, each chunk a VMEM-resident Pallas ACS call whose start metrics
    carry over from the previous chunk; packed decisions stream to HBM and
    a gather-free traceback walks the whole frame.  This is the on-chip
    half of the streaming design (BASELINE.json config 3); across chips the
    time blocks shard via :func:`streaming_viterbi_decode`.

    Args:
      dists: ``[B, T, 2^m]`` distance stream, T divisible by ``chunk``.
    Returns: ``[B, T]`` decoded bits.
    """
    from convolutional_codes_tpu.ops.viterbi import traceback_from
    from convolutional_codes_tpu.ops.viterbi_pallas import (
        BIG_METRIC, acs_forward_pallas)

    trellis = build_trellis(code)
    B, T, M = dists.shape
    if T % chunk:
        raise ValueError(f"frame length {T} not divisible by chunk {chunk}")
    S = trellis.num_states
    d_tmb = jnp.transpose(dists.astype(jnp.float32), (1, 2, 0))
    init = jnp.full((S, B), BIG_METRIC, jnp.float32).at[0, :].set(0.0)

    def body(carry, dchunk):
        fm, dec = acs_forward_pallas(trellis, dchunk, carry, False,
                                     block_lanes=min(block_lanes, B))
        return fm, dec

    fm, decs = jax.lax.scan(body, init,
                            d_tmb.reshape(T // chunk, chunk, M, B))
    decisions = decs.reshape(T, -1, B)
    end_state = jnp.argmin(fm, axis=0).astype(jnp.int32)
    return traceback_from(trellis, decisions, end_state)


@lru_cache(maxsize=None)
def _hostseg_fns(code: Code, seg_chunks: int, chunk: int, M: int, B: int,
                 block_lanes: int, interpret: bool):
    from convolutional_codes_tpu.ops.longframe_pallas import (
        stream_acs_pallas, stream_traceback_pallas)

    trellis = build_trellis(code)
    Bt = min(block_lanes, B)

    @jax.jit
    def seg_step(carry, dseg):                     # dseg [segT, M, B]
        # whole segment in ONE streaming-kernel dispatch (metrics carried
        # in VMEM scratch across its time chunks) — round 5 replaced the
        # scan of per-chunk acs_forward_pallas calls, whose per-step cost
        # dominated the decode (PERF §2b)
        return stream_acs_pallas(trellis, dseg, carry, False, chunk, Bt,
                                 interpret)

    @jax.jit
    def tb_seg(cur, dec):                          # dec [segT, w, B]
        """Reverse traceback over one segment, carrying the per-lane state
        across segment boundaries (one bounded dispatch per segment, like
        the forward pass — a million-row traceback must not be one scan)."""
        bits_tb, cur2 = stream_traceback_pallas(trellis, dec, cur, chunk,
                                                Bt, interpret)
        return cur2, jnp.swapaxes(bits_tb, 0, 1)

    return seg_step, tb_seg


def long_frame_decode_stream(code: Code, dists: jnp.ndarray,
                             hard: bool = False, chunk: int = 0,
                             block_lanes: int = 1024,
                             interpret: bool = False) -> jnp.ndarray:
    """EXACT single-dispatch-per-pass long-frame decode (round 5).

    The whole ``[B, T, M]`` distance stream decodes through two streaming
    Pallas kernels (ops/longframe_pallas): forward ACS with the path
    metrics resident in VMEM scratch while the grid pipeline
    double-buffers time-chunk blocks HBM->VMEM, then a reverse-grid
    traceback.  Unlike :func:`long_frame_decode_lanes` (overlap-save
    windows, equality only up to warmup convergence) the result is
    **bit-identical to the monolithic decode** — validated on hardware
    (tests/test_longframe_tpu.py) and in interpret mode
    (tests/test_longframe_pallas.py).  Measured round 5: 2.2-4.7e8
    info bits/s per chip at K=7 vs 7.4e6 for the windowed XLA path it
    replaces as the production real-data decoder (PERF §2b).

    Mirrors the reference's data-driven ``decoder_input`` use case
    (``AWGN-channel/include/decoder.h:17-26``) at frame lengths its
    uint8 block machinery cannot express.

    Args:
      dists: ``[B, T, M]`` distance stream (any float dtype).
      hard:  BSC hard-metric saturation semantics.
    Returns: ``[B, T]`` decoded bits.
    """
    from convolutional_codes_tpu.ops.longframe_pallas import stream_decode

    trellis = build_trellis(code)
    d_tmb = jnp.transpose(dists.astype(jnp.float32), (1, 2, 0))
    bits_tb = stream_decode(trellis, d_tmb, hard=hard, chunk=chunk,
                            block_lanes=min(block_lanes, dists.shape[0]),
                            interpret=interpret)
    return jnp.swapaxes(bits_tb, 0, 1)


#: auto-segment probe results per (code, chunk, M, B, lanes): the chosen
#: chunks-per-dispatch, so repeat calls (e.g. warm bench iterations) reuse
#: the first call's executable instead of re-probing into a different size.
_auto_seg_cache: dict = {}

#: auto mode targets this many seconds per device dispatch — comfortably
#: under the tunneled backend's ~1-2 min program watchdog (CLAUDE.md).
_AUTO_TARGET_S = 15.0


def long_frame_decode_hostseg(code: Code, dists: jnp.ndarray,
                              chunk: int = 256, segments="auto",
                              block_lanes: int = 512,
                              interpret: bool = False,
                              target_seg_s: float = _AUTO_TARGET_S
                              ) -> jnp.ndarray:
    """:func:`long_frame_decode_pallas` split into separate device
    dispatches with the ``[S, B]`` metric front carried on device between
    them.  Bit-identical output; bounds the per-dispatch runtime so
    million-bit frames stay under single-dispatch watchdog limits (the
    tunneled single-chip backend kills device programs running longer than
    ~1-2 minutes — same driver pattern as ops/seq_chunking).  The traceback
    is segmented the same way (state carried across segment boundaries).

    ``segments="auto"`` (default) probes the warm per-chunk rate with a
    one-chunk dispatch and sizes dispatches to ``target_seg_s`` seconds —
    no static segment count can be watchdog-safe across codes/shapes.  An
    integer keeps the legacy fixed split (must divide the chunk count).
    """
    from convolutional_codes_tpu.ops.viterbi_pallas import BIG_METRIC

    trellis = build_trellis(code)
    B, T, M = dists.shape
    if T % chunk:
        raise ValueError(f"frame length {T} not divisible by chunk {chunk}")
    nchunk = T // chunk
    d_tmb = jnp.transpose(dists.astype(jnp.float32), (1, 2, 0))
    S = trellis.num_states
    carry = jnp.full((S, B), BIG_METRIC, jnp.float32).at[0, :].set(0.0)

    fns = lambda sc: _hostseg_fns(code, sc, chunk, M, B, block_lanes,
                                  interpret)
    decs: list = []          # [(seg_chunks, dec [segT, w, B])]
    done = 0                 # chunks consumed

    if segments == "auto":
        ck = (code, chunk, M, B, block_lanes, interpret)
        seg_chunks = _auto_seg_cache.get(ck)
        if seg_chunks is None:
            unit_step, _ = fns(1)
            # probe: chunk 0 pays compile, chunk 1 measures the warm rate
            for _ in range(min(2, nchunk)):
                t0 = time.time()
                carry, dec = unit_step(carry, d_tmb[done * chunk:
                                                    (done + 1) * chunk])
                jax.block_until_ready(carry)
                per_chunk_s = time.time() - t0
                decs.append((1, dec))
                done += 1
            seg_chunks = max(1, min(nchunk - done,
                                    int(target_seg_s / max(per_chunk_s,
                                                           1e-6))))
            if done == 2:
                # cache only a warm-measured rate: with nchunk == 1 the
                # single probe chunk pays compile, and caching its
                # compile-inclusive seg_chunks=1 would silently pin later
                # long-frame decodes of the same (code, chunk, M, B) to
                # one-chunk dispatches (~2-5 ms tunnel RTT each)
                _auto_seg_cache[ck] = seg_chunks
    else:
        if nchunk % segments:
            raise ValueError(f"{nchunk} chunks not divisible into "
                             f"{segments} segments")
        seg_chunks = nchunk // segments

    seg_step, tb_seg = fns(seg_chunks)
    unit_step, tb_unit = fns(1)
    while done < nchunk:
        if done + seg_chunks <= nchunk:
            sc, step = seg_chunks, seg_step
        else:
            sc, step = 1, unit_step        # remainder: one-chunk dispatches
        carry, dec = step(carry, d_tmb[done * chunk:(done + sc) * chunk])
        decs.append((sc, dec))
        done += sc

    # segmented traceback, reverse order, state carried between dispatches
    cur = jnp.argmin(carry, axis=0).astype(jnp.int32)
    bits = []
    for sc, dec in reversed(decs):
        tb = tb_seg if sc == seg_chunks else tb_unit
        cur, seg_bits = tb(cur, dec.reshape(sc * chunk, dec.shape[-2],
                                            dec.shape[-1]))
        bits.append(seg_bits)
    return jnp.concatenate(bits[::-1], axis=1)


@lru_cache(maxsize=None)
def _lanes_decode_fn(code: Code, T: int, M: int, B: int, window: int,
                     warmup: int, chunk: int, block_lanes: int,
                     interpret: bool):
    from convolutional_codes_tpu.ops.viterbi_pallas import acs_forward_pallas

    trellis = build_trellis(code)
    S = trellis.num_states
    W, Wn = warmup, window
    D = T // Wn
    Tw = Wn + 2 * W                       # rows per window incl. halos
    BD = B * D
    Bt = block_lanes if BD % block_lanes == 0 else BD

    @jax.jit
    def run(dists):                       # [B, T, M] f32
        # halo padding: the frame's left edge gets the state-0 pin pattern
        # (exact — the encoder starts in state 0), the right edge uniform
        # zeros (traceback converges back onto the survivor path within W)
        pin = _pin_first_block_halo(jnp.zeros((B, W, M), jnp.float32))
        ext = jnp.concatenate(
            [pin, dists.astype(jnp.float32), jnp.zeros((B, W, M))], axis=1)
        idx = (np.arange(D)[:, None] * Wn
               + np.arange(Tw)[None, :])               # into ext rows
        win = jnp.take(ext, jnp.asarray(idx), axis=1)  # [B, D, Tw, M]
        flat = jnp.transpose(win.reshape(BD, Tw, M), (1, 2, 0))  # [Tw, M, BD]

        init = jnp.zeros((S, BD), jnp.float32)         # uniform: halo warms up

        def body(c, dchunk):
            return acs_forward_pallas(trellis, dchunk, c, False,
                                      block_lanes=Bt, interpret=interpret)

        fm, decs = jax.lax.scan(body, init,
                                flat.reshape(Tw // chunk, chunk, M, BD))
        decisions = decs.reshape(Tw, -1, BD)
        end_state = jnp.argmin(fm, axis=0).astype(jnp.int32)
        bits = traceback_from(trellis, decisions, end_state)   # [BD, Tw]
        return bits.reshape(B, D, Tw)[:, :, W: W + Wn].reshape(B, T)

    return run


def long_frame_decode_lanes(code: Code, dists: jnp.ndarray,
                            window: int = 8192, warmup: int = 128,
                            chunk: int = 256, block_lanes: int = 1024,
                            interpret: bool = False) -> jnp.ndarray:
    """Single-chip lane-parallel long-frame decode: overlap-save windows.

    A long frame at small batch (e.g. the 1e6-bit BASELINE config-0 frames
    at B=8) leaves the 128-wide VPU lanes almost empty under the exact
    sequential decode.  This splits each frame into ``window``-symbol
    blocks with ``warmup``-symbol halos on both sides — the same
    overlap-save partitioning :func:`streaming_viterbi_decode` uses across
    chips, applied *within* one chip so every block rides its own vector
    lane — and decodes all ``B * (T/window)`` blocks as one batch in the
    VMEM ACS kernel (one fast dispatch: watchdog-safe by construction).

    Output equals the monolithic decode except with probability decaying
    exponentially in ``warmup`` (validated by tests and by
    :func:`warmup_convergence_audit`); use
    :func:`long_frame_decode_hostseg` when bit-exactness is required.
    """
    B, T, M = dists.shape
    if T % window:
        raise ValueError(f"frame length {T} not divisible by window {window}")
    if (window + 2 * warmup) % chunk:
        raise ValueError(f"window+2*warmup={window + 2 * warmup} not "
                         f"divisible by chunk {chunk}")
    run = _lanes_decode_fn(code, T, M, B, window, warmup, chunk,
                           block_lanes, interpret)
    return run(dists)


def warmup_convergence_audit(code: Code, dists: jnp.ndarray,
                             window: int = 8192, warmup: int = 128,
                             **kw) -> tuple:
    """Decode-twice spot audit for the overlap-save warmup length: decodes
    with ``warmup`` and ``2*warmup`` halos and counts mismatching bits.  A
    nonzero count means ``warmup`` is too short for this code/SNR (the
    boundary error probability ~ exp(-c*warmup) is not yet negligible) —
    the runtime check VERDICT round 2 asked for instead of the silent
    fixed-warmup assumption.  Returns (bits_at_2w, mismatch_count)."""
    b1 = long_frame_decode_lanes(code, dists, window, warmup, **kw)
    b2 = long_frame_decode_lanes(code, dists, window, 2 * warmup, **kw)
    return b2, int(jnp.sum(b1 != b2))


def monolithic_reference_decode(code: Code, dists: jnp.ndarray) -> jnp.ndarray:
    """Single-program long-frame decode (ground truth for boundary checks)."""
    trellis = build_trellis(code)
    B = dists.shape[0]
    init = jnp.full((B, trellis.num_states), jnp.inf, jnp.float32).at[:, 0].set(0.0)
    final_metrics, decisions = acs_forward(trellis, dists.astype(jnp.float32),
                                           False, init)
    bits = traceback_from(trellis, decisions,
                          jnp.argmin(final_metrics, axis=-1).astype(jnp.int32))
    return bits


@lru_cache(maxsize=None)
def _fused_stream_runner(code: Code, lanes: int, wpd: int, window: int,
                         warmup: int, channel: str, demapper: str,
                         mesh: Mesh, interpret: bool):
    from convolutional_codes_tpu.ops.fused_longframe import mc_longframe_viterbi

    axes = tuple(mesh.axis_names)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(), P(axes)),
             out_specs=(P(), P()), check_vma=False)
    def run(seed, param, win0):
        be, we = mc_longframe_viterbi(
            code, lanes, wpd, seed, param, channel=channel,
            demapper=demapper, window=window, warmup=warmup,
            block_lanes=min(1024, lanes), win0=win0, interpret=interpret)
        return (jax.lax.psum(be, axes), jax.lax.psum(we, axes))

    return run


# the fused kernel embeds the constellation tables of code.symlen_out
from convolutional_codes_tpu.models.constellations import (  # noqa: E402
    register_dependent_cache as _reg_dep)

_reg_dep(_fused_stream_runner.cache_clear)


def streaming_mc_accumulate(code: Code, lanes: int, windows: int, seed,
                            param, mesh: Mesh, channel: str = "awgn",
                            demapper: str = "soft", window: int = 1920,
                            warmup: int = 128, interpret: bool = False):
    """Sequence-parallel fused streaming Monte-Carlo: each device decodes a
    distinct TIME RANGE of the same ``lanes`` coded streams.

    The fused long-frame kernel's windows are independent overlap-save
    decodes of hash-addressed stream positions (ops/fused_longframe), so
    sequence parallelism needs no ppermute state handoff: each device
    regenerates its halos locally from the position-addressable RNG, and a
    D-device run is **bit-identical** to the monolithic
    ``mc_longframe_viterbi(code, lanes, windows, ...)`` decode of the same
    streams (tests/test_streaming.py) — the TPU-native replacement for the
    distance-fed handoff path above, which remains for decoding real
    received data.  Per-chip rate equals the fused kernel's (no comms on
    the hot path; one psum per call).

    Returns (bit_errors [lanes], window_errors [lanes], info_bits) with
    counters summed across devices.
    """
    ndev = int(np.prod(list(mesh.shape.values())))
    if windows % ndev:
        raise ValueError(f"{windows} windows not divisible by {ndev} devices")
    wpd = windows // ndev
    run = _fused_stream_runner(code, lanes, wpd, window, warmup, channel,
                               demapper, mesh, interpret)
    win0 = jnp.asarray(np.arange(ndev, dtype=np.int32) * wpd)
    be, we = run(jnp.int32(int(seed) & 0x7FFFFFFF), jnp.float32(param), win0)
    return be, we, lanes * windows * window


def dryrun_streaming(n_devices: int) -> None:
    """Tiny end-to-end streaming step over a ``seq`` mesh (driver dry run)."""
    from convolutional_codes_tpu.models.codebook import get_code
    from convolutional_codes_tpu.ops.encoder import encode_stream
    from convolutional_codes_tpu.parallel.mesh import make_mesh

    code = get_code("nasa-k7")
    mesh = make_mesh({"seq": n_devices}, devices=jax.devices()[:n_devices])
    W = 16
    L = n_devices * 64 - (code.constraint_length - 1)
    key = jax.random.PRNGKey(0)
    bits = jax.random.bernoulli(key, 0.5, (2, L)).astype(jnp.int32)
    syms = encode_stream(code, bits, terminate=True)
    M = code.points_per_symbol
    dists = jnp.ones(syms.shape + (M,), jnp.float32)
    onehot = jax.nn.one_hot(syms, M, dtype=jnp.float32)
    dists = dists - onehot  # 0 at tx symbol, 1 elsewhere (noiseless)
    out = streaming_viterbi_decode(code, dists, mesh, warmup=W)
    decoded = np.asarray(out)[:, :L]
    assert np.array_equal(decoded, np.asarray(bits)), "streaming dryrun mismatch"

    # fused streaming MC leg: per-device time-range windows, psum counters
    be, we, nb = streaming_mc_accumulate(
        code, lanes=8, windows=n_devices, seed=3, param=0.35, mesh=mesh,
        window=64, warmup=32,
        interpret=jax.default_backend() != "tpu")
    assert nb == 8 * n_devices * 64
    assert be.shape == (8,)
