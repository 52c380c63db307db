"""TPU-only equality probes for the sequential MC kernels.

The interpret-mode suite (tests/test_fano_mc.py, test_stack_mc.py) proves
the machines; these runs prove the SAME equality on real hardware — Mosaic
compilation, the TPU float pipeline (FMA contraction is the known hazard,
see sequential_common.force_rounded) and the in-kernel coordinate-hash
datagen must reproduce the XLA machines' counts bit-for-bit on chip:

  CONVCODES_TEST_TPU=1 python -m pytest tests/test_seq_mc_tpu.py -q

Both kernels are probed on every production-routed config class
(sim/sweep.py routes WSPR T*M=324, hard-demap and all BSC sequential
grids through mc_stack/mc_fano): AWGN soft, WSPR K=32, hard demapper,
BSC, and the K=15+16-QAM flagship for Fano.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma
from convolutional_codes_tpu.ops.fano import fano_decode_soft, fano_decode_hard
from convolutional_codes_tpu.ops.fano_mc import mc_fano, fano_frames_host
from convolutional_codes_tpu.ops.stack import stack_decode_soft, stack_decode_hard
from convolutional_codes_tpu.ops.stack_mc import mc_stack, stack_frames_host

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu",
                                reason="hardware equality probes")

FANO_CASES = [
    # (code, channel, param, demapper, timeout_per_bit)
    (0, "awgn", float(awgn_sigma(4.0)), "soft", 40),
    (4, "awgn", float(awgn_sigma(5.0)), "soft", 25),     # WSPR K=32
    (0, "awgn", float(awgn_sigma(4.0)), "hard", 40),     # hard demapper
    (0, "bsc", 0.05, "soft", 60),                        # BSC hard metrics
    # K=15 + 16-QAM (T*M = 3424): production-routed through mc_fano
    # since round 4; cliff-region noise so errors actually flow
    ("k15-r14-16qam", "awgn", float(awgn_sigma(5.0)), "soft", 50),
]

STACK_CASES = [
    # (code, channel, param, demapper)
    (0, "awgn", float(awgn_sigma(5.0)), "soft"),
    (4, "awgn", float(awgn_sigma(4.0)), "soft"),         # WSPR K=32, T*M=324
    (0, "awgn", float(awgn_sigma(5.0)), "hard"),         # hard demapper
    (0, "bsc", 0.05, "soft"),                            # BSC int32 metrics
]


def _cpu_ref(fn, *args):
    """Reference decode on the CPU backend: the XLA machines are proven
    bit-exact by the CPU suite, and a long single-dispatch while_loop on
    the tunneled TPU risks the backend watchdog (CLAUDE.md) — the
    hardware-under-test here is the Pallas kernel, not the reference."""
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(jax.jit(fn, backend="cpu")(*args))


@pytest.mark.parametrize("ck,channel,param,dem,tpb", FANO_CASES)
def test_mc_fano_hw_counts_equal_xla_decode(ck, channel, param, dem, tpb):
    code = get_code(ck)
    lanes, fpl = 256, 2
    be, fe, nb = mc_fano(code, lanes, fpl, 17, param, channel=channel,
                         demapper=dem, timeout_per_bit=tpb, block_lanes=128)
    bits, syms = fano_frames_host(code, np.arange(lanes * fpl), 17, param,
                                  channel, dem)
    if channel == "awgn":
        dec = _cpu_ref(lambda d: fano_decode_soft(code, d, tpb),
                       jnp.asarray(syms))
    else:
        dec = _cpu_ref(lambda d: fano_decode_hard(code, d, tpb),
                       jnp.asarray(syms))
    err = dec != bits[:, : code.block_length]
    assert (be, fe) == (int(err.sum()), int(err.any(1).sum()))
    assert be > 0


@pytest.mark.parametrize("ck,channel,param,dem", STACK_CASES)
def test_mc_stack_hw_counts_equal_xla_decode(ck, channel, param, dem):
    code = get_code(ck)
    lanes, fpl = 256, 2
    be, fe, nb = mc_stack(code, lanes, fpl, 23, param, channel=channel,
                          demapper=dem, block_lanes=128)
    bits, syms = stack_frames_host(code, np.arange(lanes * fpl), 23, param,
                                   channel, dem)
    if channel == "awgn":
        dec = _cpu_ref(lambda d: stack_decode_soft(code, d),
                       jnp.asarray(syms))
    else:
        dec = _cpu_ref(lambda d: stack_decode_hard(code, d),
                       jnp.asarray(syms))
    err = dec != bits[:, : code.block_length]
    assert (be, fe) == (int(err.sum()), int(err.any(1).sum()))
    assert be > 0
