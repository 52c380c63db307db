"""Render the reproduced BER curves against the published reference tables.

The reference's L4 layer is a pair of Octave scripts that plot its
hard-coded result tables (results/awgn_channel.m:80-146,
results/binary_symmetric_channel.m:44-74).  This is the framework-side
equivalent over our recorded full-tier reruns: one figure per
(channel, decoder, demapper) family, our curves as solid lines with
solid markers and the published table as hollow diamonds in the same
hue, BER on a log axis.  Zero-BER cells (no observed errors at the tier
sample size) are omitted, as a log axis demands.

Usage: python tools/plot_curves.py   (writes results/plots/*.png)

Colors are the validated default categorical palette (slots 1-6, fixed
order keyed to the code index) from the dataviz reference instance;
identity is never color-alone — published vs ours is carried by marker
fill/shape, and each code is direct-labeled in the legend.
"""

from __future__ import annotations

import json
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.reproduce_curves import CONFIGS, GOLD, RESULTS  # noqa: E402
from convolutional_codes_tpu.sim.sweep import (  # noqa: E402
    AWGN_SNR_GRID, BSC_CROSSOVER_GRID)
from convolutional_codes_tpu.utils.records import read_jsonl  # noqa: E402

PLOTS = RESULTS / "plots"

#: categorical slots 1-6 (fixed order, keyed to code index — never cycled)
CODE_COLOR = {0: "#2a78d6", 1: "#eb6834", 2: "#1baf7a",
              3: "#eda100", 4: "#e87ba4", 5: "#008300"}
CODE_LABEL = {0: "K=3 (101,011)", 1: "K=4 (1011,1110)",
              2: "K=5 (10101,11110)", 3: "K=6 (101101,111010)",
              4: "K=32 WSPR", 5: "K=3 rate-1/3"}

SURFACE, INK, INK2, GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e7e6e2"

#: figure key -> title
FAMILIES = {
    "awgn_viterbi_soft": "AWGN, soft-decision Viterbi",
    "awgn_viterbi_hard": "AWGN, hard-demapper Viterbi",
    "awgn_stack_soft": "AWGN, stack decoder (soft)",
    "awgn_stack_hard": "AWGN, stack decoder (hard demapper)",
    "awgn_fano_soft": "AWGN, Fano decoder (soft)",
    "awgn_fano_hard": "AWGN, Fano decoder (hard demapper)",
    "bsc_viterbi": "BSC, hard Viterbi",
    "bsc_stack": "BSC, stack decoder",
    "bsc_fano": "BSC, Fano decoder",
    "uncoded": "Uncoded symbol-decision baselines",
}


def _plot_16qam_extension(figures):
    """16-QAM extension figure: the K=15 rate-1/4 Fano cliff grid plus the
    uncoded Gray-16-QAM curve with its exact closed form (the published
    diamonds of the reference configs have no counterpart here — the
    extension's anchor is the closed form and the FER=1 -> 0 cliff)."""
    import math

    fano = RESULTS / "awgn_fano_16qam.jsonl"
    unc = RESULTS / "uncoded_4.jsonl"
    missing = [p.name for p in (fano, unc) if not p.exists()]
    if missing:
        # loud, not silent: every published config must have its grid
        # committed (round-3 verdict: this skip hid a missing flagship file)
        raise FileNotFoundError(
            f"16-QAM extension grids missing from results/: {missing}")
    fig, ax = plt.subplots(figsize=(7.2, 5.4), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    if unc.exists():
        recs = read_jsonl(unc)
        pts = sorted((r["point"], r["ber"]) for r in recs)
        ax.plot([p for p, b in pts if b > 0], [b for _, b in pts if b > 0],
                "-o", color=CODE_COLOR[1], linewidth=1.6, markersize=4.5,
                label="uncoded 16-QAM", zorder=3)
        a = 1.0 / math.sqrt(10.0)
        from convolutional_codes_tpu.ops.channels import awgn_sigma

        def qf(x):
            return 0.5 * math.erfc(x / math.sqrt(2.0))

        xs = [p / 10.0 for p in range(0, 161, 2)]
        ys = []
        for p in xs:
            s = float(awgn_sigma(p, info_bits_per_symbol=4))
            ys.append(0.25 * (3 * qf(a / s) + 2 * qf(3 * a / s)
                              - qf(5 * a / s)))
        ax.plot(xs, ys, "--", color=CODE_COLOR[1], linewidth=1.0,
                label="16-QAM closed form", zorder=2)
    if fano.exists():
        recs = read_jsonl(fano)
        pts = sorted((r["point"], r["ber"], r["fer"]) for r in recs)
        ax.plot([p for p, b, _ in pts if b > 0],
                [b for _, b, _ in pts if b > 0],
                "-o", color=CODE_COLOR[0], linewidth=1.6, markersize=4.5,
                label="K=15 r=1/4 Fano BER", zorder=3)
        ax.plot([p for p, _, f in pts if f > 0],
                [f for _, _, f in pts if f > 0],
                ":s", color=CODE_COLOR[2], linewidth=1.2, markersize=4,
                label="K=15 r=1/4 Fano FER", zorder=3)
    _style_axes(ax, "awgn")
    ax.set_title("16-QAM extension: K=15 rate-1/4 Fano cliff + uncoded "
                 "closed-form anchor", color=INK, fontsize=11)
    ax.legend(loc="best", fontsize=8, framealpha=0.9, facecolor=SURFACE,
              edgecolor=GRID, labelcolor=INK)
    out = PLOTS / "awgn_16qam_extension.png"
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    plt.close(fig)
    print("wrote", out)


def _family_of(name: str) -> str:
    if name.startswith("uncoded"):
        return "uncoded"
    return name.rsplit("_", 1)[0]


def _style_axes(ax, channel):
    ax.set_facecolor(SURFACE)
    ax.set_yscale("log")
    if channel == "bsc":
        ax.set_xscale("log")
        ax.set_xlabel("channel crossover probability", color=INK2)
    else:
        ax.set_xlabel("Eb/N0 (dB)", color=INK2)
    ax.set_ylabel("bit error rate", color=INK2)
    ax.grid(True, which="major", color=GRID, linewidth=0.6)
    ax.tick_params(colors=INK2, labelsize=9)
    for s in ax.spines.values():
        s.set_color(GRID)


def main() -> None:
    PLOTS.mkdir(exist_ok=True)
    figures = {}
    for name, (spec_kw, row, channel) in CONFIGS.items():
        path = RESULTS / f"{name}.jsonl"
        if not path.exists():
            continue
        if row is None:
            # extension configs (16-QAM family) have no published diamonds;
            # they get the dedicated _plot_16qam_extension figure
            continue
        fam = _family_of(name)
        if fam not in figures:
            fig, ax = plt.subplots(figsize=(7.2, 5.4), dpi=150)
            fig.patch.set_facecolor(SURFACE)
            figures[fam] = (fig, ax)
        fig, ax = figures[fam]

        code = 2 if name == "uncoded_2" else 3 if name == "uncoded_3" \
            else spec_kw["code"]
        color = CODE_COLOR[code if fam != "uncoded" else (0 if code == 2 else 1)]
        label = ("QPSK" if name == "uncoded_2"
                 else "8-QAM" if name == "uncoded_3" else CODE_LABEL[code])

        recs = read_jsonl(path)
        pts = sorted((r["point"], r["ber"]) for r in recs)
        xs = [p for p, b in pts if b > 0]
        ys = [b for _, b in pts if b > 0]
        ax.plot(xs, ys, "-o", color=color, linewidth=1.6, markersize=4.5,
                label=label, zorder=3)

        # published x positions come from the CANONICAL grids, never from
        # the observed records — a partial rerun must not shift diamonds
        pub = GOLD[channel][row]
        px = AWGN_SNR_GRID if channel == "awgn" else BSC_CROSSOVER_GRID
        assert len(px) == len(pub), (row, len(px), len(pub))
        pxy = [(x, y) for x, y in zip(px, pub) if y > 0]
        ax.plot([x for x, _ in pxy], [y for _, y in pxy], linestyle="none",
                marker="D", markersize=7, markerfacecolor="none",
                markeredgecolor=color, markeredgewidth=1.2, zorder=2)

    for fam, (fig, ax) in figures.items():
        channel = "bsc" if fam.startswith("bsc") else "awgn"
        _style_axes(ax, channel)
        ax.set_title(FAMILIES[fam] + "\n(lines+dots: this framework, "
                     "full reference tier sizes; hollow diamonds: published)",
                     color=INK, fontsize=11)
        ax.legend(loc="best", fontsize=8, framealpha=0.9,
                  facecolor=SURFACE, edgecolor=GRID, labelcolor=INK)
        out = PLOTS / f"{fam}.png"
        fig.tight_layout()
        fig.savefig(out, facecolor=SURFACE)
        plt.close(fig)
        print("wrote", out)

    _plot_16qam_extension(figures)


if __name__ == "__main__":
    main()
