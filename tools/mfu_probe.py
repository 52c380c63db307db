#!/usr/bin/env python3
"""Headline-MFU lever probe: one variant per process (wedge-safe protocol,
CLAUDE.md — set JAX_COMPILATION_CACHE_DIR, never timeout-kill mid-compile).

Measures the fused AWGN soft-Viterbi chain (ops/fused_chain.py, the
BENCH headline row's exact protocol: B=1M lanes, Bt=1024, 16 steps
in-kernel, 4 timed calls with fresh seeds) under one variant/ablation per
invocation, so each lever of the 24% → 40% MFU attack gets its own
measured number (VERDICT round-4 item 2; PERF.md §1):

  python tools/mfu_probe.py baseline
  python tools/mfu_probe.py fast_demap
  python tools/mfu_probe.py unroll12          # unroll override probes
  python tools/mfu_probe.py stage_floor       # static_noise+cheap_enc+fast_demap
  ...

Prints one JSON line {"variant", "bits_per_s", "ps_per_bit", "mfu_pct",
"ber", "bits"}.  Ablation variants (cheap_bm/static_noise/cheap_enc/no_tb
and combos) produce INVALID statistics — their BER is reported only to
show they executed; only bits_per_s is meaningful.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.ops.channels import awgn_sigma   # noqa: E402
from convolutional_codes_tpu.ops.fused_chain import (         # noqa: E402
    mc_chain_viterbi, _TRELLIS_UNROLL)

ANALYTIC_BOUND = 2.4e10   # PERF.md §1: 3.8e12 lane-ops/s / ~158 ops per bit

#: probe name -> (variant tokens, unroll)
PROBES = {
    "baseline": ("", _TRELLIS_UNROLL),
    "unroll1": ("", 1),
    "unroll2": ("", 2),
    "unroll12": ("", 12),
    "unroll42": ("", 42),
    "fast_demap": ("fast_demap", _TRELLIS_UNROLL),
    # NOTE: no bf16 probes — Mosaic rejects bf16 vector compares on v5e
    # ("Target does not support this comparison", minimal-kernel probe,
    # round 5); the bf16_acs lever is closed at the ISA level.
    # --- measurement-only ablations (statistics invalid) ---
    "cheap_bm": ("cheap_bm", _TRELLIS_UNROLL),
    "static_noise": ("static_noise", _TRELLIS_UNROLL),
    "cheap_enc": ("cheap_enc", _TRELLIS_UNROLL),
    "no_tb": ("no_tb", _TRELLIS_UNROLL),
    # trellis-loop floor: every non-ACS stage stubbed/hoisted
    "stage_floor": ("static_noise,cheap_enc,fast_demap", _TRELLIS_UNROLL),
    "stage_floor_notb": ("static_noise,cheap_enc,fast_demap,no_tb",
                         _TRELLIS_UNROLL),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    variant, unroll = PROBES[name]
    assert jax.default_backend() == "tpu", "probe is a hardware measurement"

    code = get_code(0)
    B, nsteps, Bt, calls = 1048576, 16, 1024, 4
    sigma = jnp.float32(awgn_sigma(8.0))

    @jax.jit
    def many(seed):
        be, fe = mc_chain_viterbi(code, B, nsteps, seed, sigma,
                                  block_lanes=Bt, variant=variant,
                                  unroll=unroll)
        return be.sum(dtype=jnp.int32)

    _ = int(many(jnp.int32(1)))                      # compile + tunnel warm
    t0 = time.time()
    errs = [many(jnp.int32(500 + i)) for i in range(calls)]
    jax.block_until_ready(errs)
    dt = time.time() - t0

    bits = B * code.block_length * nsteps * calls
    bps = bits / dt
    print(json.dumps({
        "variant": name, "tokens": variant, "unroll": unroll,
        "bits_per_s": round(bps, 1),
        "ps_per_bit": round(1e12 / bps, 1),
        "mfu_pct": round(100.0 * bps / ANALYTIC_BOUND, 1),
        "ber": sum(int(e) for e in errs) / bits, "bits": bits,
    }), flush=True)


if __name__ == "__main__":
    main()
