#!/usr/bin/env python3
"""Reproduce the reference's published BER curves at full sample sizes.

Runs the framework's sweep runner at the reference's tiered Monte-Carlo
sample counts, compares every point against the published tables
(tests/goldens/published_curves.json) with binomial z-scores, and writes
results/<name>.jsonl + an Octave-compatible table + a summary.

Usage:
  python tools/reproduce_curves.py [--quick] [--config awgn_viterbi ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from convolutional_codes_tpu.sim.sweep import (  # noqa: E402
    SweepSpec, run_sweep, awgn_tier_bits, bsc_tier_bits)
from convolutional_codes_tpu.utils import records as rec  # noqa: E402

GOLD = json.load(open(REPO / "tests" / "goldens" / "published_curves.json"))
RESULTS = REPO / "results"


def zscore(p_obs, n_obs, p_pub, n_pub, cluster=1.0):
    if p_obs == 0 and p_pub == 0:
        return 0.0
    var = cluster * ((p_obs * (1 - p_obs)) / max(n_obs, 1)
                     + (p_pub * (1 - p_pub)) / max(n_pub, 1))
    if var == 0:
        return float("inf") if p_obs != p_pub else 0.0
    return (p_obs - p_pub) / math.sqrt(var)


def compare(records, channel, row_name, scale):
    pub = GOLD[channel][row_name]
    grid = GOLD[channel]["SNR" if channel == "awgn" else "ber_uncoded"]
    tier = awgn_tier_bits if channel == "awgn" else bsc_tier_bits
    lines = []
    worst = 0.0
    for r in records:
        idx = min(range(len(grid)), key=lambda j: abs(grid[j] - r.point))
        p_pub = pub[idx]
        n_pub = tier(r.point)
        if r.bit_errors == 0 and p_pub > 0:
            # zero observations: errors arrive in per-frame bursts, so the
            # expected count of frame EVENTS (Poisson) decides significance;
            # cluster size unknown → conservative L/4 bits per event
            lam = p_pub * r.bits / max(1.0, r.bits / max(r.frames, 1) / 4)
            z = -math.sqrt(lam)
        else:
            cluster = max(1.0, r.bit_errors / max(r.frame_errors, 1))
            z = zscore(r.ber, r.bits, p_pub, n_pub, cluster)
        worst = max(worst, abs(z))
        lines.append(f"  point={r.point:<10g} ours={r.ber:.6e} "
                     f"published={p_pub:.6e} z={z:+.2f}")
    return lines, worst


CONFIGS = {
    # name: (spec kwargs, published row, channel)
    **{f"awgn_viterbi_soft_{i}": (dict(code=i, channel="awgn", decoder="viterbi",
                                       demapper="soft"), row, "awgn")
       for i, row in zip([0, 1, 2, 3, 5],
                         ["ber_coded_a", "ber_coded_b", "ber_coded_c",
                          "ber_coded_d", "ber_coded_e"])},
    **{f"awgn_viterbi_hard_{i}": (dict(code=i, channel="awgn", decoder="viterbi",
                                       demapper="hard"), row, "awgn")
       for i, row in zip([0, 1, 2, 3, 5],
                         ["ber_coded_ah", "ber_coded_bh", "ber_coded_ch",
                          "ber_coded_dh", "ber_coded_eh"])},
    "bsc_viterbi_0": (dict(code=0, channel="bsc", decoder="viterbi"),
                      "ber_coded_a", "bsc"),
    "uncoded_2": (dict(code=0, channel="uncoded"), "ber_uncoded_2", "awgn"),
    "uncoded_3": (dict(code=5, channel="uncoded"), "ber_uncoded_3", "awgn"),
    # sequential decoders: reduced grids (full low-SNR sweeps are
    # lockstep-slow; see CLAUDE.md)
    **{f"awgn_stack_{dm}_{i}": (dict(code=i, channel="awgn", decoder="stack",
                                     demapper=dm,
                                     points=[4.0, 6.0, 8.0],
                                     frames_per_step=8192),
                                f"ber_coded_{c}{'h' if dm == 'hard' else ''}_stack",
                                "awgn")
       for dm in ("soft", "hard")
       for c, i in zip("abcde", [0, 1, 2, 3, 5]) if not (dm == "soft" and i == 0)},
    "bsc_stack_full_0": (dict(code=0, channel="bsc", decoder="stack",
                              points=[0.003125, 0.00625, 0.0125, 0.025,
                                      0.05, 0.1],
                              frames_per_step=8192),
                         "ber_coded_a_stack", "bsc"),
    "awgn_stack_soft_0": (dict(code=0, channel="awgn", decoder="stack",
                               points=[4.0, 6.0, 8.0], bits_per_point=4e5,
                               frames_per_step=4096),
                          "ber_coded_a_stack", "awgn"),
    "awgn_stack_soft_wspr": (dict(code=4, channel="awgn", decoder="stack",
                                  points=[4.0, 6.0], bits_per_point=4e5,
                                  frames_per_step=4096),
                             "ber_coded_f_stack", "awgn"),
    "bsc_stack_0": (dict(code=0, channel="bsc", decoder="stack",
                         points=[0.0125, 0.05], bits_per_point=4e5,
                         frames_per_step=4096),
                    "ber_coded_a_stack", "bsc"),
    # Fano sweeps cap the decode budget at 4000 cycles/bit on TPU: a single
    # lockstep dispatch at the reference's 10000 budget can run for minutes
    # and trips the worker watchdog. At these SNRs the budget rarely binds
    # (timeout events are rare), so the bias is far below MC noise.
    "awgn_fano_soft_0": (dict(code=0, channel="awgn", decoder="fano",
                              points=[6.0, 8.0], bits_per_point=8e4,
                              frames_per_step=2048, timeout_per_bit=4000),
                         "ber_coded_a_fano", "awgn"),
    **{f"awgn_fano_soft_{i}": (dict(code=i, channel="awgn", decoder="fano",
                                    points=[6.0, 8.0], bits_per_point=8e4,
                                    frames_per_step=2048, timeout_per_bit=4000),
                               f"ber_coded_{c}_fano", "awgn")
       for c, i in zip("bcde", [1, 2, 3, 5])},
    "bsc_fano_0": (dict(code=0, channel="bsc", decoder="fano",
                        points=[0.0125, 0.05], bits_per_point=8e4,
                        frames_per_step=2048, timeout_per_bit=4000),
                   "ber_coded_a_fano", "bsc"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1%% of the reference sample sizes")
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--config", nargs="*", default=None)
    ap.add_argument("--frames", type=int, default=262144)
    args = ap.parse_args()
    scale = args.scale if args.scale is not None else (0.01 if args.quick else 1.0)

    RESULTS.mkdir(exist_ok=True)
    names = args.config or list(CONFIGS)
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        ap.error(f"unknown config(s) {unknown}; choose from {sorted(CONFIGS)}")
    summary = []
    for name in names:
        kw, row, channel = CONFIGS[name]
        kw = dict(kw)
        frames = kw.pop("frames_per_step", args.frames)
        spec = SweepSpec(frames_per_step=frames, base_bits=8e8 * scale,
                         seed=1234, **kw)
        print(f"=== {name} (scale {scale}) ===", flush=True)
        records = run_sweep(spec, verbose=True)
        rec.write_jsonl(records, str(RESULTS / f"{name}.jsonl"))
        rec.write_octave([(name, records)], str(RESULTS / f"{name}.m"))
        lines, worst = compare(records, channel, row, scale)
        print("\n".join(lines), flush=True)
        agg = sum(r.bits for r in records) / sum(r.wall_s for r in records)
        summary.append((name, worst, agg))
        print(f"  worst |z| = {worst:.2f}, aggregate {agg:.3e} bits/s", flush=True)

    print("\n=== summary ===")
    for name, worst, agg in summary:
        flag = "OK " if worst < 4.5 else "WARN"
        print(f"{flag} {name:26s} worst|z|={worst:6.2f} {agg:.3e} bits/s")


if __name__ == "__main__":
    main()
