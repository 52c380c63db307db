#!/usr/bin/env python3
"""Measure the phase-chaining gain on the production Fano MC kernel
(round-5 item 8): same protocol as the PERF §3b table (1024 lanes, warm,
fresh seeds, reference TIMEOUT=10000), at the SNRs whose C-core rates are
recorded in PERF §3/§4a.  Run AFTER the chaining change; compare against
the §3b table (2026-08-19/20 numbers, pre-chaining kernel).
"""

import json
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.ops.channels import awgn_sigma   # noqa: E402
from convolutional_codes_tpu.ops.fano_mc import mc_fano       # noqa: E402

#: (label, code, snr_db, lanes, fpl, pre-chaining bits/s from PERF)
CASES = [
    ("fano_k3_0db", 0, 0.0, 1024, 8, 3.1e4),
    ("fano_k3_6db", 0, 6.0, 1024, 64, 8.6e5),
    ("fano_k3_8db", 0, 8.0, 1024, 64, 3.8e6),
    ("fano_k3_12db", 0, 12.0, 1024, 64, 1.9e7),
    ("fano_wspr_6db", 4, 6.0, 1024, 64, None),
    ("fano_k15_16qam_8db", "k15-r14-16qam", 8.0, 1024, 64, None),
]


def main():
    assert jax.default_backend() == "tpu"
    for label, ck, snr, lanes, fpl, pre in CASES:
        code = get_code(ck)
        param = float(awgn_sigma(snr))
        mc_fano(code, lanes, fpl, 1, param, block_lanes=128,
                timeout_per_bit=10000)                   # compile + warm
        t0 = time.time()
        be, fe, nb = mc_fano(code, lanes, fpl, 4242, param,
                             block_lanes=128, timeout_per_bit=10000)
        dt = time.time() - t0
        r = {"probe": label, "bits_per_s": round(nb / dt, 1),
             "ber": be / nb, "bits": nb}
        if pre:
            r["vs_prechain"] = round(nb / dt / pre, 2)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
