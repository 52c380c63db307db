#!/usr/bin/env python3
"""Attribute the fused-streaming shard-body overhead (VERDICT r4 item 5).

BENCH_r04 read 7.7e8 bits/s for `awgn_k7_streaming_fused_per_chip`
(streaming_mc_accumulate, seq:1 mesh, lanes=65536, windows=2) vs 1.09e9
for the monolithic fused kernel row (mc_longframe_viterbi, lanes=131072,
nsteps=4) — a 29% gap with no attribution.  The two rows also differ in
per-call WORK SHAPE (4x fewer window-decodes per call), so this probe
runs the 2x2: {shard_map wrapper, bare kernel} x {(65536,2), (131072,4)}
— plus the wrapper at (131072,4) with the counter reduce inside the jit —
to separate sharding cost from amortization.

One process, one probe sweep (wedge-safe: JAX_COMPILATION_CACHE_DIR set,
fresh seeds per call).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convolutional_codes_tpu.models.codebook import get_code          # noqa: E402
from convolutional_codes_tpu.ops.channels import awgn_sigma           # noqa: E402
from convolutional_codes_tpu.ops.fused_longframe import (             # noqa: E402
    mc_longframe_viterbi)
from convolutional_codes_tpu.parallel.mesh import make_mesh           # noqa: E402
from convolutional_codes_tpu.parallel.streaming import (              # noqa: E402
    streaming_mc_accumulate)

WINDOW, WARMUP, CALLS = 1920, 128, 3


def timed(label, fn, bits_per_call):
    fn(1)                                   # compile + warm
    t0 = time.time()
    for i in range(CALLS):
        fn(100 + i)
    dt = time.time() - t0
    bps = bits_per_call * CALLS / dt
    print(json.dumps({"probe": label, "bits_per_s": round(bps, 1),
                      "ms_per_call": round(1e3 * dt / CALLS, 1)}), flush=True)
    return bps


def main():
    assert jax.default_backend() == "tpu"
    code = get_code("nasa-k7")
    param = float(awgn_sigma(6.0))
    mesh = make_mesh({"seq": 1}, devices=jax.devices()[:1])

    for lanes, windows in ((65536, 2), (131072, 4)):
        bits = lanes * windows * WINDOW

        @jax.jit
        def bare(seed, lanes=lanes, windows=windows):
            be, we = mc_longframe_viterbi(code, lanes, windows, seed, param,
                                          channel="awgn", window=WINDOW,
                                          warmup=WARMUP, block_lanes=1024)
            return be.sum(dtype=jnp.int32)

        timed(f"bare_kernel_{lanes}x{windows}",
              lambda s: int(bare(jnp.int32(s))), bits)

        def shard(seed, lanes=lanes, windows=windows):
            be, we, nb = streaming_mc_accumulate(
                code, lanes, windows, seed, param, mesh,
                window=WINDOW, warmup=WARMUP)
            return int(jnp.sum(be))        # bench row's out-of-jit reduce

        timed(f"shard_seq1_{lanes}x{windows}", shard, bits)


if __name__ == "__main__":
    main()
