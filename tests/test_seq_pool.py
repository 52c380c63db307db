"""The cross-batch straggler pool (ops/seq_chunking.py) must produce
bit-identical error counts to direct per-batch decodes — it only changes
*when* lanes are advanced, never their lockstep trajectories.

Runs the pooled sweep accumulator in Pallas interpret mode on CPU against
the XLA decoders on the same channel realizations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma
from convolutional_codes_tpu.ops.fano import fano_decode_soft
from convolutional_codes_tpu.ops.stack import stack_decode_soft
from convolutional_codes_tpu.sim.sweep import (
    SweepSpec, _fano_front, _sequential_host_accumulate)


def _direct_counts(code, decoder, param, nsteps, pkey, chunk_idx, frames,
                   timeout):
    front = _fano_front(code, "awgn", "soft", frames)
    be = fe = nb = 0
    for i in range(nsteps):
        key = jax.random.fold_in(jax.random.fold_in(pkey, chunk_idx), i)
        bits, rx = front(key, jnp.float32(param))
        if decoder == "fano":
            dec = fano_decode_soft(code, rx, timeout_per_bit=timeout)
        else:
            dec = stack_decode_soft(code, rx)
        err = np.asarray(dec != bits)
        be += int(err.sum())
        fe += int(err.any(axis=1).sum())
        nb += frames * code.block_length
    return be, fe, nb


def _check(decoder, snr_db, timeout=100):
    code = get_code(0)
    frames = 128
    spec = SweepSpec(code=0, channel="awgn", decoder=decoder, demapper="soft",
                     frames_per_step=frames, timeout_per_bit=timeout)
    param = float(awgn_sigma(snr_db))
    pkey = jax.random.PRNGKey(7)
    got = _sequential_host_accumulate(code, spec, param, 2, pkey, 0,
                                      interpret=True)
    want = _direct_counts(code, decoder, param, 2, pkey, 0, frames, timeout)
    assert got == want, (got, want)


def test_pool_stack_matches_direct_high_snr():
    _check("stack", 8.0)


def test_pool_stack_matches_direct_low_snr():
    # low SNR: deep searches → survivors cross batches through the carry
    _check("stack", 3.0)


def test_pool_fano_matches_direct():
    # small decode budget → timed-out frames exercise the carry path
    _check("fano", 5.0, timeout=60)
