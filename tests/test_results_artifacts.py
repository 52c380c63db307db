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
    _, worst = compare(records, channel, row)
    assert worst is not None
    assert abs(worst) < Z_THRESHOLD, (name, worst)
    # full reference tier sample sizes at every point
    assert scale_of(records, channel) >= 1.0, name
