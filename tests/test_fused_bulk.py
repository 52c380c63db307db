"""The bulk-staged fused MC kernel must equal the loop kernel exactly.

`_mc_kernel_bulk` re-schedules the fused Monte-Carlo chain (encoder,
channel, demapper hoisted to whole-[T, Bt] plane ops before the trellis
loop) without changing the RNG draw order or any per-element float
expression, so for a given (seed, tile) its error counters are
bit-identical to `_mc_kernel`'s.  Runs in interpret mode on CPU (the
counter-hash PRNG path), covering every channel/demapper combination and
the compat-parity quirk codes.
"""

import numpy as np
import pytest

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma
from convolutional_codes_tpu.ops.fused_chain import mc_chain_viterbi


@pytest.mark.parametrize("code_key,channel,demapper,param", [
    (0, "awgn", "soft", awgn_sigma(6.0)),
    (0, "awgn", "hard", awgn_sigma(6.0)),
    (0, "bsc", "soft", 0.0125),
    (5, "awgn", "soft", awgn_sigma(4.0)),          # rate 1/3, 8-QAM
    ("nasa-k7", "awgn", "soft", awgn_sigma(4.0)),  # S=64 ceiling
    (1, "bsc", "soft", 0.05),                      # parity-quirk code
    ("k9-r12", "awgn", "soft", awgn_sigma(0.0)),   # S=256, MXU matmul path
    ("k9-r12", "awgn", "hard", awgn_sigma(0.0)),
    ("k9-r12", "bsc", "soft", 0.05),
])
def test_bulk_kernel_matches_loop_kernel(code_key, channel, demapper, param):
    code = get_code(code_key)
    kw = dict(batch=128, nsteps=2, seed=11, param=float(param),
              channel=channel, block_lanes=128, interpret=True,
              demapper=demapper)
    e1, f1 = mc_chain_viterbi(code, **kw)
    e2, f2 = mc_chain_viterbi(code, bulk_stages=True, **kw)
    assert np.array_equal(np.asarray(e1), np.asarray(e2))
    assert np.array_equal(np.asarray(f1), np.asarray(f2))
    assert int(np.asarray(e1).sum()) > 0     # non-trivial comparison


def test_fused_counters_pinned():
    """Both kernel variants reproduce the pinned interpret-mode counters
    (captured 2026-08-18) — guards refactors of the shared kernel bodies
    when no hardware is attached."""
    import pathlib
    gold = np.load(pathlib.Path(__file__).parent / "goldens" /
                   "fused_interp_counters.npz")
    from convolutional_codes_tpu.ops.channels import awgn_sigma as sig
    cases = [
        (0, "awgn", "soft", float(sig(6.0))),
        (0, "awgn", "hard", float(sig(6.0))),
        (0, "bsc", "soft", 0.0125),
        (5, "awgn", "soft", float(sig(4.0))),
        ("nasa-k7", "awgn", "soft", float(sig(4.0))),
        (1, "bsc", "soft", 0.05),
    ]
    for ck, ch, dm, p in cases:
        code = get_code(ck)
        for bulk in (False, True):
            e, f = mc_chain_viterbi(code, batch=128, nsteps=2, seed=11,
                                    param=p, channel=ch, block_lanes=128,
                                    interpret=True, demapper=dm,
                                    bulk_stages=bulk)
            key = f"{code.name}_{ch}_{dm}"
            assert np.array_equal(np.asarray(e), gold[key + "_e"]), (key, bulk)
            assert np.array_equal(np.asarray(f), gold[key + "_f"]), (key, bulk)
