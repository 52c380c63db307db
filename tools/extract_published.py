#!/usr/bin/env python3
"""Extract the reference's published BER tables (results/*.m) into a JSON
fixture (tests/goldens/published_curves.json) for automated curve diffing.
Pure data extraction — the Octave files are the reference's de-facto golden
record (SURVEY.md §6)."""

import json
import os
import re
import sys
from pathlib import Path

REF = Path(os.environ.get("REFERENCE_DIR", "/root/reference"))
OUT = Path(__file__).resolve().parent.parent / "tests" / "goldens" / "published_curves.json"

ROW = re.compile(r"^\s*(\w+)\s*=\s*\[([^\]]*)\]\s*;")


def parse(path):
    rows = {}
    for line in path.read_text().splitlines():
        m = ROW.match(line)
        if m:
            vals = [float(x) for x in m.group(2).replace(",", " ").split()]
            rows[m.group(1)] = vals
    return rows


def main():
    data = {
        "awgn": parse(REF / "results" / "awgn_channel.m"),
        "bsc": parse(REF / "results" / "binary_symmetric_channel.m"),
    }
    # row-name → (code index, decoder, demapper) mapping for the AWGN file
    data["awgn_rows"] = {
        "ber_uncoded_2": ["uncoded", 2], "ber_uncoded_3": ["uncoded", 3],
        **{f"ber_coded_{c}": [i, "viterbi", "soft"]
           for c, i in zip("abcde", [0, 1, 2, 3, 5])},
        **{f"ber_coded_{c}h": [i, "viterbi", "hard"]
           for c, i in zip("abcde", [0, 1, 2, 3, 5])},
        **{f"ber_coded_{c}_stack": [i, "stack", "soft"]
           for c, i in zip("abcdef", [0, 1, 2, 3, 5, 4])},
        **{f"ber_coded_{c}h_stack": [i, "stack", "hard"]
           for c, i in zip("abcdef", [0, 1, 2, 3, 5, 4])},
        **{f"ber_coded_{c}_fano": [i, "fano", "soft"]
           for c, i in zip("abcdef", [0, 1, 2, 3, 5, 4])},
        **{f"ber_coded_{c}h_fano": [i, "fano", "hard"]
           for c, i in zip("abcdef", [0, 1, 2, 3, 5, 4])},
    }
    data["bsc_rows"] = {
        **{f"ber_coded_{c}": [i, "viterbi"]
           for c, i in zip("abcde", [0, 1, 2, 3, 5])},
        **{f"ber_coded_{c}_stack": [i, "stack"]
           for c, i in zip("abcdef", [0, 1, 2, 3, 5, 4])},
        **{f"ber_coded_{c}_fano": [i, "fano"]
           for c, i in zip("abcdef", [0, 1, 2, 3, 5, 4])},
    }
    OUT.write_text(json.dumps(data, indent=1))
    na = len(data["awgn"])
    nb = len(data["bsc"])
    print(f"wrote {OUT}: {na} awgn rows, {nb} bsc rows")


if __name__ == "__main__":
    sys.exit(main())
