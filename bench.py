#!/usr/bin/env python3
"""Headline benchmark: decoded info bits/s of the full AWGN soft-Viterbi chain.

Runs the complete flagship pipeline (on-device RNG bits → convolutional
encoder → QPSK mapper → AWGN channel → soft demapper → Viterbi decode →
BER accumulate) for the default K=3 rate-1/2 code at 8 dB Eb/N0 on whatever
backend is available (real TPU under the driver; Pallas kernels on TPU, XLA
fallback elsewhere).

Baseline: the C reference measured ~6.6e6 info bits/s for this exact chain
on one CPU core (BASELINE.md, "Soft Viterbi K=3 full chain").  Prints one
JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma

BASELINE_BITS_PER_S = 6.6e6   # reference C, 1 CPU core (BASELINE.md)


def _make_many_tpu(code, B, L, sigma, nsteps):
    """All-in-one Monte-Carlo Pallas kernel: bits, encode, AWGN, demap, ACS,
    traceback and error counting stay in VMEM; only per-lane error counters
    touch HBM."""
    from convolutional_codes_tpu.ops.fused_chain import mc_awgn_viterbi

    @jax.jit
    def many(seed):
        be, fe = mc_awgn_viterbi(code, B, nsteps, seed, sigma,
                                 block_lanes=1024)
        return be.sum(dtype=jnp.int32)

    return many


def _make_many_xla(code, B, L, sigma, nsteps):
    from convolutional_codes_tpu.sim.chain import make_point_step
    step = make_point_step(code, "awgn", "viterbi", "soft", frames=B)

    @jax.jit
    def many(key):
        def body(c, i):
            be, fe, nb = step(jax.random.fold_in(key, i), sigma)
            return c + be, None
        out, _ = jax.lax.scan(body, jnp.int32(0), np.arange(nsteps, dtype=np.int32))
        return out

    return many


def main():
    code = get_code(0)
    L = code.block_length
    on_tpu = jax.default_backend() == "tpu"
    B = 1048576 if on_tpu else 4096
    nsteps = 16 if on_tpu else 2
    sigma = jnp.float32(awgn_sigma(8.0))
    maker = _make_many_tpu if on_tpu else _make_many_xla
    many = maker(code, B, L, sigma, nsteps)

    key = jax.random.PRNGKey(0)
    # warmup: compile AND pay the backend's one-time device->host path cost
    _ = int(many(jnp.int32(1) if on_tpu else key))

    calls = 4
    t0 = time.time()
    errs = [many(jnp.int32(100 + i) if on_tpu
                 else jax.random.fold_in(key, 100 + i))
            for i in range(calls)]
    jax.block_until_ready(errs)
    dt = time.time() - t0

    tot_bits = B * L * nsteps * calls
    bits_per_s = tot_bits / dt
    ber = sum(int(e) for e in errs) / tot_bits
    print(json.dumps({
        "metric": "awgn_soft_viterbi_k3_full_chain_throughput",
        "value": round(bits_per_s, 1),
        "unit": "info_bits/s",
        "vs_baseline": round(bits_per_s / BASELINE_BITS_PER_S, 3),
        "detail": {"ber_at_8db": ber, "published_ber": 1.3756e-4,
                   "bits": tot_bits, "backend": jax.default_backend()},
    }))


if __name__ == "__main__":
    main()
