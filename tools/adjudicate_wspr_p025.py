#!/usr/bin/env python3
"""Same-scale adjudication of the WSPR-stack BSC p=0.025 point (round-5
verdict item 7): >=2e8 bits through the clean-RNG C chain (splitmix64 +
exact threshold, tools/golden_harness/harness_ber_bsc_clean.c) against
>=2e8 bits through the production `mc_stack` kernel, compared with a
cluster-corrected two-sample z (bit errors arrive in per-frame bursts,
~10 bits/event here, so binomial variance is inflated by that factor —
same model as tools/reproduce_curves.py).

The clean C counts are passed in via --clean "bits:be:fe" (repeatable,
one per independent seed run); the hash side runs here on the TPU.

Writes results/adjudication_wspr_stack_p025.json.
"""

import argparse
import json
import math
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.ops.stack_mc import mc_stack     # noqa: E402

P = 0.025


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clean", action="append", default=[],
                    metavar="BITS:BE:FE",
                    help="one clean-RNG C run's counters (repeatable)")
    ap.add_argument("--seeds", type=int, nargs="*",
                    default=[7001, 7002, 7003, 7004])
    ap.add_argument("--lanes", type=int, default=8192)
    ap.add_argument("--fpl", type=int, default=200)
    args = ap.parse_args()

    code = get_code(4)
    runs = []
    for seed in args.seeds:
        t0 = time.time()
        be, fe, nb = mc_stack(code, args.lanes, args.fpl, seed, P,
                              channel="bsc")
        dt = time.time() - t0
        runs.append({"seed": seed, "bits": nb, "bit_errors": be,
                     "frame_errors": fe, "ber": be / nb,
                     "wall_s": round(dt, 2)})
        print(f"  mc_stack seed={seed}: {nb} bits, ber={be/nb:.6e} "
              f"({dt:.1f} s)", flush=True)

    h_bits = sum(r["bits"] for r in runs)
    h_be = sum(r["bit_errors"] for r in runs)
    h_fe = sum(r["frame_errors"] for r in runs)

    c_bits = c_be = c_fe = 0
    for spec in args.clean:
        b, e, f = (int(x) for x in spec.split(":"))
        c_bits += b
        c_be += e
        c_fe += f

    p_h, p_c = h_be / h_bits, c_be / c_bits
    # cluster = bits per frame-error event, estimated per side
    cl_h = h_be / max(h_fe, 1)
    cl_c = c_be / max(c_fe, 1)
    var = (cl_h * p_h * (1 - p_h) / h_bits
           + cl_c * p_c * (1 - p_c) / c_bits)
    z = (p_h - p_c) / math.sqrt(var)

    out = {
        "note": "Round-5 same-scale adjudication of the WSPR-stack BSC "
                "p=0.025 point (VERDICT r4 item 7): the production "
                "mc_stack kernel (coordinate-hash ideal BSC) vs the "
                "clean-RNG C chain (splitmix64 + exact 2^64 threshold, "
                "harness_ber_bsc_clean.c), cluster-corrected two-sample "
                "z.  Supersedes the round-4 argument-based adjudication "
                "(z=-3.76 vs a 2.4e8-bit clean row with only 8e7 hash "
                "bits).",
        "crossover": P,
        "hash_side": {"bits": h_bits, "bit_errors": h_be,
                      "frame_errors": h_fe, "ber": p_h, "runs": runs},
        "clean_side": {"bits": c_bits, "bit_errors": c_be,
                       "frame_errors": c_fe, "ber": p_c,
                       "nruns": len(args.clean)},
        "cluster_bits_per_event": {"hash": round(cl_h, 2),
                                   "clean": round(cl_c, 2)},
        "z": round(z, 3),
    }
    path = REPO / "results" / "adjudication_wspr_stack_p025.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"hash {p_h:.6e} ({h_bits} bits) vs clean {p_c:.6e} "
          f"({c_bits} bits): z = {z:+.3f} -> {path}", flush=True)


if __name__ == "__main__":
    main()
