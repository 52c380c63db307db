#!/usr/bin/env python3
"""Headline benchmark: decoded info bits/s of the full AWGN soft-Viterbi chain.

Runs the complete flagship pipeline (on-device RNG bits → convolutional
encoder → QPSK mapper → AWGN channel → soft demapper → batched Viterbi
decode → BER accumulate) for the default K=3 rate-1/2 code at 8 dB Eb/N0 on
whatever backend is available (real TPU under the driver).

Baseline: the C reference measured ~6.6e6 info bits/s for this exact chain
on one CPU core (BASELINE.md, "Soft Viterbi K=3 full chain").  Prints one
JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.ops.channels import awgn_sigma
from convolutional_codes_tpu.sim.chain import make_point_step

BASELINE_BITS_PER_S = 6.6e6   # reference C, 1 CPU core (BASELINE.md)


def main():
    code = get_code(0)
    frames = 16384
    steps_per_call = 8
    step = make_point_step(code, "awgn", "viterbi", "soft", frames=frames)
    sigma = jnp.float32(awgn_sigma(8.0))

    import numpy as np

    @jax.jit
    def many(key):
        def body(carry, i):
            be, fe, nb = step(jax.random.fold_in(key, i), sigma)
            return (carry[0] + be, carry[1] + nb), None
        # host-constant xs: device-array constants force a device->host
        # readback at lowering time (slow on tunneled backends)
        out, _ = jax.lax.scan(body, (jnp.int32(0), jnp.int32(0)),
                              np.arange(steps_per_call, dtype=np.int32))
        return out

    key = jax.random.PRNGKey(0)
    # warmup: compile AND pay the backend's one-time device->host path cost
    be, nb = many(key)
    _ = int(be) + int(nb)

    calls = 6
    t0 = time.time()
    tot_err = tot_bits = 0
    for i in range(calls):
        be, nb = many(jax.random.fold_in(key, 1000 + i))
        tot_err += int(be)
        tot_bits += int(nb)
    dt = time.time() - t0

    bits_per_s = tot_bits / dt
    ber = tot_err / tot_bits
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
