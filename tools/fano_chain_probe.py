#!/usr/bin/env python3
"""Measure the fano phase-chaining gain (round-5 item 8) as a same-session
A/B: run once normally and once with CONVCODES_NO_CHAIN=1 (identical
counters by construction — the env gates only the micro-step composition).
Same protocol as the PERF §3b table (warm, fresh seeds, reference
TIMEOUT=10000); fpl sized for multi-second timed walls (sub-second runs
are dispatch-ramp noise, CLAUDE.md)."""

import json
import os
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.ops.channels import awgn_sigma   # noqa: E402
from convolutional_codes_tpu.ops.fano_mc import mc_fano       # noqa: E402

#: (label, code, snr_db, lanes, fpl)
CASES = [
    ("fano_k3_0db", 0, 0.0, 1024, 16),
    ("fano_k3_6db", 0, 6.0, 1024, 128),
    ("fano_k3_8db", 0, 8.0, 1024, 512),
    ("fano_k3_12db", 0, 12.0, 1024, 2048),
    ("fano_wspr_6db", 4, 6.0, 1024, 256),
    ("fano_k15_16qam_8db", "k15-r14-16qam", 8.0, 1024, 256),
]


def main():
    assert jax.default_backend() == "tpu"
    arm = "unchained" if os.environ.get("CONVCODES_NO_CHAIN") else "chained"
    for label, ck, snr, lanes, fpl in CASES:
        code = get_code(ck)
        param = float(awgn_sigma(snr))
        mc_fano(code, lanes, max(1, fpl // 8), 1, param, block_lanes=128,
                timeout_per_bit=10000)                   # compile + warm
        t0 = time.time()
        be, fe, nb = mc_fano(code, lanes, fpl, 4242, param,
                             block_lanes=128, timeout_per_bit=10000)
        dt = time.time() - t0
        print(json.dumps({"probe": label, "arm": arm,
                          "bits_per_s": round(nb / dt, 1),
                          "ber": be / nb, "bits": nb,
                          "wall_s": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
