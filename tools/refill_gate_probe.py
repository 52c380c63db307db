#!/usr/bin/env python3
"""Measure the adaptive refill-gate gain (round 5) as a same-session A/B:
run once with the default batched gate (div=8) and once with
CONVCODES_REFILL_GATE=1 (the original any-lane gate).  Counters are
bit-identical by construction — the datagen is (lane, frame-id)-addressed
(ops/mc_datagen), so WHEN a lane is refilled cannot change WHAT it
decodes; the probe asserts count equality across arms via the printed
BER.  One arm per process (the kernels are built once per process and
read the env at trace time).  Protocol per PERF §3b: warm, fresh seeds,
multi-second timed walls (CLAUDE.md probe hygiene).
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.ops.channels import awgn_sigma   # noqa: E402
from convolutional_codes_tpu.ops.fano_mc import mc_fano       # noqa: E402
from convolutional_codes_tpu.ops.stack_mc import mc_stack     # noqa: E402

#: (label, decoder, code, snr_db, lanes, fpl, block_lanes)
CASES = [
    ("fano_k3_0db", "fano", 0, 0.0, 1024, 16, 128),
    ("fano_k3_6db", "fano", 0, 6.0, 1024, 128, 128),
    ("fano_k3_8db", "fano", 0, 8.0, 1024, 512, 128),
    ("fano_k3_12db", "fano", 0, 12.0, 1024, 2048, 128),
    ("fano_wspr_6db", "fano", 4, 6.0, 1024, 256, 128),
    ("fano_k15_16qam_6db", "fano", "k15-r14-16qam", 6.0, 1024, 128, 128),
    ("fano_k15_16qam_8db", "fano", "k15-r14-16qam", 8.0, 1024, 1024, 128),
    ("fano_k15_16qam_14db", "fano", "k15-r14-16qam", 14.0, 1024, 2048, 128),
    ("stack_k3_8db", "stack", 0, 8.0, 4096, 4096, 0),
    ("stack_k9_8db", "stack", 3, 8.0, 4096, 2048, 0),
    # code 5 (rate-1/3, 8-QAM, M=8): the smallest constellation the
    # auto rule batches — probed so the M>=8 threshold is measured,
    # not assumed, at both production decoders
    ("fano_k3r13_8db", "fano", 5, 8.0, 1024, 1024, 128),
    ("stack_k3r13_8db", "stack", 5, 8.0, 4096, 2048, 0),
]


def main():
    assert jax.default_backend() == "tpu"
    div = os.environ.get("CONVCODES_REFILL_GATE") or "8"
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    for label, dec, ck, snr, lanes, fpl, bl in CASES:
        if only and only not in label:
            continue
        code = get_code(ck)
        param = float(awgn_sigma(snr))
        if dec == "fano":
            def run(seed, n):
                return mc_fano(code, lanes, n, seed, param, block_lanes=bl,
                               timeout_per_bit=10000)
        else:
            def run(seed, n):
                return mc_stack(code, lanes, n, seed, param,
                                block_lanes=bl)
        run(1, max(1, fpl // 8))                     # compile + warm
        t0 = time.time()
        be, fe, nb = run(4242, fpl)
        dt = time.time() - t0
        print(json.dumps({"probe": label, "gate_div": div,
                          "bits_per_s": round(nb / dt, 1),
                          "ber": be / nb, "bit_errs": be, "frame_errs": fe,
                          "bits": nb, "wall_s": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
