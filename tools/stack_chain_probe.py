#!/usr/bin/env python3
"""Measure the stack phase-chaining gain (round 5): the caught
(accept-symbol) micro-step now chains into the same node's extension —
one micro-step saved per accepted symbol (~T of the ~500 micro-steps a
clean frame costs).  Same protocol as the bench stack rows (auto tile,
warm, fresh seeds)."""

import json
import sys
import time

import jax

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.ops.channels import awgn_sigma   # noqa: E402
from convolutional_codes_tpu.ops.stack_mc import mc_stack     # noqa: E402

#: (label, code, snr_db, lanes, fpl) — fpl sized for multi-second timed
#: walls: sub-second runs are dominated by the budget-bounded dispatch
#: ramp + tunnel per-call overhead and read as pure noise (CLAUDE.md).
#: Compare arms via CONVCODES_NO_CHAIN=1, not historical constants.
CASES = [
    ("stack_k3_6db", 0, 6.0, 4096, 512),
    ("stack_k3_8db", 0, 8.0, 4096, 2048),
    ("stack_k9_8db", "k9-r12", 8.0, 1024, 1024),
    ("stack_wspr_4db", 4, 4.0, 1024, 512),
]


def main():
    assert jax.default_backend() == "tpu"
    import os
    arm = "unchained" if os.environ.get("CONVCODES_NO_CHAIN") else "chained"
    for label, ck, snr, lanes, fpl in CASES:
        code = get_code(ck)
        param = float(awgn_sigma(snr))
        mc_stack(code, lanes, 64, 1, param)            # compile + warm + ramp
        t0 = time.time()
        be, fe, nb = mc_stack(code, lanes, fpl, 4242, param)
        dt = time.time() - t0
        print(json.dumps({"probe": label, "arm": arm,
                          "bits_per_s": round(nb / dt, 1),
                          "ber": be / nb, "bits": nb,
                          "wall_s": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
