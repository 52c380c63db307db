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
                             warmup: int = 128, seq_axis: str = "seq"
                             ) -> jnp.ndarray:
    """Decode a long soft-demapped frame sharded over time blocks.

    Args:
      dists: ``[B, T, 2^m]`` distance stream, T divisible by the seq-axis
        size; sharded (or shardable) over axis 1.
      mesh: mesh containing ``seq_axis``.
      warmup: halo length W in symbols.

    Returns: ``[B, T]`` decoded bits (the caller strips the K-1 tail).
    """
    trellis = build_trellis(code)
    D = mesh.shape[seq_axis]
    B, T, M = dists.shape
    if T % D != 0:
        raise ValueError(f"frame length {T} not divisible by seq axis {D}")
    W = warmup

    spec_in = P(None, seq_axis, None)
    spec_out = P(None, seq_axis)

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

        # Forward ACS over [W, Tl, W] segments; capture metrics at the true
        # frame end for the last block's traceback.
        init = jnp.zeros((B, trellis.num_states), jnp.float32)
        mid_metrics, dec_a = acs_forward(trellis, ext[:, : W + Tl], False, init)
        end_metrics, dec_b = acs_forward(trellis, ext[:, W + Tl:], False,
                                         mid_metrics)
        decisions = jnp.concatenate([dec_a, dec_b], axis=0)  # [W+Tl+W, B, S]

        start_state = jnp.where(
            last,
            jnp.argmin(mid_metrics, axis=-1),
            jnp.argmin(end_metrics, axis=-1)).astype(jnp.int32)
        start_index = jnp.where(last, W + Tl, W + Tl + W)
        bits_ext = traceback_from(trellis, decisions, start_state,
                                  start_index=start_index)
        return bits_ext[:, W: W + Tl]

    return run(dists)


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
    from convolutional_codes_tpu.ops.viterbi_pallas import acs_forward_pallas

    trellis = build_trellis(code)

    @jax.jit
    def seg_step(carry, dseg):                     # dseg [segT, M, B]
        def body(c, dchunk):
            return acs_forward_pallas(trellis, dchunk, c, False,
                                      block_lanes=min(block_lanes, B),
                                      interpret=interpret)
        return jax.lax.scan(body, carry,
                            dseg.reshape(seg_chunks, chunk, M, B))

    @jax.jit
    def finish(fm, decs):                          # decs [nseg, segT, w, B]
        decisions = decs.reshape(-1, decs.shape[-2], decs.shape[-1])
        end_state = jnp.argmin(fm, axis=0).astype(jnp.int32)
        return traceback_from(trellis, decisions, end_state)

    return seg_step, finish


def long_frame_decode_hostseg(code: Code, dists: jnp.ndarray,
                              chunk: int = 256, segments: int = 16,
                              block_lanes: int = 512,
                              interpret: bool = False) -> jnp.ndarray:
    """:func:`long_frame_decode_pallas` split into ``segments`` separate
    device dispatches with the ``[S, B]`` metric front carried on device
    between them.  Bit-identical output; bounds the per-dispatch runtime so
    million-bit frames stay under single-dispatch watchdog limits (the
    tunneled single-chip backend kills device programs running longer than
    ~1-2 minutes — same driver pattern as ops/seq_chunking).

    ``segments`` must divide the chunk count; each segment reuses one
    compiled executable.
    """
    from convolutional_codes_tpu.ops.viterbi_pallas import BIG_METRIC

    trellis = build_trellis(code)
    B, T, M = dists.shape
    if T % chunk:
        raise ValueError(f"frame length {T} not divisible by chunk {chunk}")
    nchunk = T // chunk
    if nchunk % segments:
        raise ValueError(f"{nchunk} chunks not divisible into "
                         f"{segments} segments")
    seg_chunks = nchunk // segments
    segT = seg_chunks * chunk
    seg_step, finish = _hostseg_fns(code, seg_chunks, chunk, M, B,
                                    block_lanes, interpret)
    d_tmb = jnp.transpose(dists.astype(jnp.float32), (1, 2, 0))
    S = trellis.num_states
    carry = jnp.full((S, B), BIG_METRIC, jnp.float32).at[0, :].set(0.0)
    decs = []
    for s in range(segments):                      # one dispatch per segment
        carry, dec = seg_step(carry, d_tmb[s * segT:(s + 1) * segT])
        decs.append(dec)
    return finish(carry, jnp.stack(decs))


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
