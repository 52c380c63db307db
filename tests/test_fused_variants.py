"""Statistical-contract variants of the fused chain (fast_demap/bf16_acs).

``fast_demap`` replaces the reference's squared-distance expression
(demapper.c:61-85) with its expanded linear form minus the per-symbol
common term; the ACS argmin is mathematically unchanged, only float
rounding differs.  These tests pin (a) the algebra — the fast vector
differs from the exact one by a single per-position constant — and
(b) the statistical contract at small scale; the hardware z-tests live
with the probe results (PERF.md §1, tools/mfu_probe.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma
from convolutional_codes_tpu.ops.fused_chain import (
    _stage_fns, mc_chain_viterbi)


@pytest.mark.parametrize("ck", [0, 5, "k15-r14-16qam"])
def test_fast_demap_is_exact_minus_common_shift(ck):
    """d_lin[e] - d_exact[e] must be the same value for every e at each
    position (that common shift is what cancels in the ACS compares).
    Covers QPSK (const-modulus, shift includes |p|^2), 8-QAM and 16-QAM
    (per-point |p_e|^2 retained)."""
    code = get_code(ck)
    _, _, _, dist_exact, _ = _stage_fns(code)
    _, _, _, dist_lin, _ = _stage_fns(code, fast_demap=True)
    rng = np.random.default_rng(3)
    rxi = jnp.asarray(rng.normal(0, 1, 4096).astype(np.float32))
    rxq = jnp.asarray(rng.normal(0, 1, 4096).astype(np.float32))
    de = np.stack([np.asarray(d) for d in dist_exact(rxi, rxq)])
    dl = np.stack([np.asarray(d) for d in dist_lin(rxi, rxq)])
    shift = dl - de                      # [M, N]
    spread = shift.max(axis=0) - shift.min(axis=0)
    # tolerance: few ulp of the largest metric magnitude per position
    tol = 1e-5 * np.maximum(np.abs(de).max(axis=0), 1.0)
    assert (spread <= tol).all()


def test_fast_variants_statistically_close():
    """Same PRNG stream, perturbed rounding: per-frame decodes almost
    always agree, so counts stay within a loose band of baseline.
    (The full-scale z-test runs on hardware, PERF.md §1.)"""
    code = get_code(0)
    sig = float(awgn_sigma(5.0))
    kw = dict(interpret=True, block_lanes=512)
    base = mc_chain_viterbi(code, 512, 4, 11, sig, **kw)
    nb = int(base[0].sum())
    assert nb > 50
    for v in ("fast_demap", "bf16_acs", "fast_demap,bf16_acs"):
        r = mc_chain_viterbi(code, 512, 4, 11, sig, variant=v, **kw)
        n = int(r[0].sum())
        assert 0.5 * nb < n < 2.0 * nb, (v, n, nb)


def test_variant_validation():
    code = get_code(0)
    with pytest.raises(ValueError, match="unknown variant"):
        mc_chain_viterbi(code, 64, 1, 0, 0.5, variant="nope",
                         interpret=True, block_lanes=64)
    with pytest.raises(ValueError, match="loop-schedule"):
        mc_chain_viterbi(code, 64, 1, 0, 0.5, variant="fast_demap",
                         bulk_stages=True, interpret=True, block_lanes=64)
    k9 = get_code("k9-r12")   # S=256 > _UNROLL_STATES -> matmul ACS path
    with pytest.raises(ValueError, match="bf16_acs"):
        mc_chain_viterbi(k9, 64, 1, 0, 0.5, variant="bf16_acs",
                         interpret=True, block_lanes=64)
