"""Channel models with on-device counter-based RNG.

The reference injects noise inline in driver callbacks: AWGN adds
``scaling * gengauss()`` per I/Q component (``AWGN-channel/main.c:99-102``,
Box-Muller over libc rand, ``common/gaussian.c:18-38``); the BSC flips each
of the symlen_out coded bits independently with the crossover probability
(``binary-symmetric-channel/main.c:61-68``).

Here channels are pure functions over ``jax.random`` keys (threefry) —
distribution-level equivalence, not bitstream equality (SURVEY.md §2e).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def awgn_sigma(ebn0_db, info_bits_per_symbol: float = 1.0):
    """Per-component noise std dev for a unit-power constellation.

    ``sigma = 1/sqrt(2) * 10^(-EbN0dB/20) / sqrt(info_bits_per_symbol)``.
    The coded chains transmit 1 info bit per channel symbol (rate-1/m code on
    a 2^m constellation), so Eb = Es (``AWGN-channel/main.c:153-161``); the
    uncoded chain carries symlen_out info bits per symbol and converts via the
    extra 1/sqrt(m) (``uncoded/main.c:150-153``).
    """
    scale = 10.0 ** (-jnp.asarray(ebn0_db, dtype=jnp.float32) / 20.0)
    return jnp.float32(1.0 / math.sqrt(2.0)) * scale / jnp.float32(math.sqrt(info_bits_per_symbol))


def awgn(key: jax.Array, iq: jnp.ndarray, sigma) -> jnp.ndarray:
    """Add N(0, sigma^2) per I/Q component.  ``sigma`` must broadcast against
    ``iq`` (scalar, or e.g. ``[snr_rows, 1, 1, 1]`` for a batched sweep)."""
    noise = jax.random.normal(key, iq.shape, dtype=iq.dtype)
    return iq + jnp.asarray(sigma, iq.dtype) * noise


def bsc(key: jax.Array, symbols: jnp.ndarray, crossover, num_bits: int) -> jnp.ndarray:
    """Flip each of the ``num_bits`` coded bits of each symbol independently
    with probability ``crossover`` (scalar or broadcastable against
    ``symbols.shape + (num_bits,)``)."""
    u = jax.random.uniform(key, symbols.shape + (num_bits,), dtype=jnp.float32)
    flips = (u < jnp.asarray(crossover, jnp.float32)).astype(jnp.int32)
    weights = (1 << jnp.arange(num_bits, dtype=jnp.int32))
    flipmask = (flips * weights).sum(-1)
    return symbols ^ flipmask
