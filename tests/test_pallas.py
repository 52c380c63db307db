"""Pallas kernels vs the XLA path (interpret mode on CPU; bit-exact)."""

import jax.numpy as jnp
import numpy as np
import pytest

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.models.trellis import build_trellis
from convolutional_codes_tpu.ops.viterbi import (
    acs_forward, initial_metrics, traceback_from, hard_branch_metrics,
    HARD_METRIC_SAT)
from convolutional_codes_tpu.ops.viterbi_pallas import (
    acs_forward_pallas, traceback_pallas, BIG_METRIC)


@pytest.mark.parametrize("name,hard", [(0, False), (0, True),
                                       ("nasa-k7", False), (3, True),
                                       ("k9-r12", False), ("k9-r12", True)])
def test_pallas_matches_xla(name, hard):
    code = get_code(name)
    tr = build_trellis(code)
    B, T, M = 256, code.num_block_symbols, code.points_per_symbol
    rng = np.random.default_rng(42)
    if hard:
        rx = rng.integers(0, M, size=(B, T))
        bm = hard_branch_metrics(code, jnp.asarray(rx))
    else:
        bm = jnp.asarray(rng.random((B, T, M)).astype(np.float32))

    init = initial_metrics(tr, B, hard)
    fm_x, dec_x = acs_forward(tr, bm, hard, init)

    d_tmb = jnp.transpose(bm.astype(jnp.float32), (1, 2, 0))
    init_val = float(HARD_METRIC_SAT) if hard else BIG_METRIC
    init_sb = jnp.full((tr.num_states, B), init_val, jnp.float32).at[0].set(0.0)
    fm_p, dec_p = acs_forward_pallas(tr, d_tmb, init_sb, hard,
                                     block_lanes=128, interpret=True)

    fm_x_np = np.asarray(fm_x, dtype=np.float64)
    fm_p_np = np.asarray(fm_p.T, dtype=np.float64)
    finite = np.isfinite(fm_x_np)
    assert np.array_equal(fm_x_np[finite], fm_p_np[finite])
    assert np.array_equal(np.asarray(dec_x), np.asarray(dec_p))

    ss = jnp.argmin(fm_x, axis=-1).astype(jnp.int32)
    bits_x = traceback_from(tr, dec_x, ss)
    bits_p = traceback_pallas(tr, dec_p, ss, block_lanes=128, interpret=True)
    assert np.array_equal(np.asarray(bits_x), np.asarray(bits_p).T)


def test_pallas_rejects_large_state_spaces():
    code = get_code("k15-r12")  # S = 16384 — beyond the kernel ceiling
    tr = build_trellis(code)
    with pytest.raises(NotImplementedError):
        acs_forward_pallas(tr, jnp.zeros((5, 4, 128), jnp.float32),
                           jnp.zeros((tr.num_states, 128), jnp.float32),
                           False, block_lanes=128, interpret=True)
