"""The recorded curve artifacts must keep passing the published-table
comparators.

The statistical unit tests run at 1e4-4e5 bits (fast, low sensitivity);
the real statistical weight lives in results/*.jsonl — full reference-tier
reruns of every published configuration.  This test re-verifies those
artifacts inside the suite with the same cluster-corrected comparator the
reproduction tooling uses, so a regression that silently corrupted or
truncated them (or a comparator change that loosened the bound) fails CI.
"""

import pytest

from tools.reproduce_curves import CONFIGS, Z_THRESHOLD, compare
from tools.curve_table import load, scale_of


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_recorded_grid_matches_published(name):
    kw, row, channel = CONFIGS[name]
    records = load(name)
    assert records, f"missing results/{name}.jsonl"
    # full reference tier sample sizes at every point
    assert scale_of(records, channel) >= 1.0, name
    if row is None:
        # extension config (16-QAM family): the reference publishes no row;
        # anchored instead by the closed-form / cliff tests below
        return
    _, worst = compare(records, channel, row)
    assert worst is not None
    assert abs(worst) < Z_THRESHOLD, (name, worst)


def test_fano_16qam_grid_cliff():
    """The recorded K=15 rate-1/4 16-QAM Fano grid
    (results/awgn_fano_16qam.jsonl, BASELINE config 4 / the flagship
    extension) must show the tuned sequential-decoding cliff: FER = 1
    deep below the cutoff region, a sharp drop through 4-6 dB, and
    error-free 8e8-bit samples at 12-14 dB."""
    import json

    from tools.reproduce_curves import RESULTS

    with open(RESULTS / "awgn_fano_16qam.jsonl") as f:
        rows = {r["point"]: r for r in map(json.loads, f)}
    assert set(rows) >= {0.0, 2.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0, 12.0, 14.0}
    assert rows[0.0]["fer"] == 1.0 and rows[2.0]["fer"] == 1.0
    assert 0.2 < rows[4.0]["fer"] <= 1.0          # mid-cliff
    assert 0 < rows[5.0]["fer"] < 0.05            # past the knee
    assert 0 < rows[6.0]["fer"] < 5e-3
    assert rows[10.0]["fer"] < 5e-5
    for p in (12.0, 14.0):
        assert rows[p]["bits"] >= 8e8 and rows[p]["bit_errors"] == 0


def test_uncoded_16qam_grid_matches_closed_form():
    """The recorded full-tier uncoded 16-QAM grid (results/uncoded_4.jsonl,
    the closed-form anchor for the 16-QAM extension) must match the exact
    Gray-16-QAM BER formula at every point."""
    import json
    import math

    def qf(x):
        return 0.5 * math.erfc(x / math.sqrt(2.0))

    from tools.reproduce_curves import RESULTS

    a = 1.0 / math.sqrt(10.0)
    with open(RESULTS / "uncoded_4.jsonl") as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 8
    for r in rows:
        sigma = r["param"]
        q1, q3, q5 = (qf(k * a / sigma) for k in (1, 3, 5))
        exp = 0.25 * (3 * q1 + 2 * q3 - q5)
        n, e = r["bits"], r["bit_errors"]
        z = (e / n - exp) / math.sqrt(max(exp * (1 - exp) / n, 1e-30))
        assert abs(z) < 4.5, (r["point"], z)
