"""Coordinate-hash Monte-Carlo frame generation for the sequential MC
kernels (ops/fano_mc.py, ops/stack_mc.py).

One pure function of (seed, global frame id, symbol position) produces a
frame's info bits and channel output, built from the fused-chain stage
helpers (encoder parity/quirk, mapper, Box-Muller AWGN or BSC flips,
soft/hard demapper — ops/fused_chain._stage_fns) over the coordinate hash
of ops/fused_longframe.  Because it is position-addressable and uses only
plain vector ops, the same expression runs inside a Pallas kernel (lane
refill), in the XLA host replica used by tests, and identically in
interpret mode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from convolutional_codes_tpu.models.codebook import Code
from convolutional_codes_tpu.ops.fused_chain import _stage_fns
from convolutional_codes_tpu.ops.fused_longframe import (
    _TWO_PI, coord_bits, coord_uniform)


def make_datagen(code: Code, T: int, L: int, channel: str,
                 demapper: str):
    """Returns ``gen(gid, row, seed, param) -> (bits, syms)``.

    ``gid``/``row`` are broadcast-compatible int arrays of global frame
    ids and symbol positions (e.g. ``[T, Bt]`` planes inside a kernel, or
    ``[N, 1]`` × ``[1, T]`` on the host); ``bits`` is the info-bit plane
    (tail rows zeroed), ``syms`` the demapper distances (soft channels,
    trailing/leading M axis matching the input layout) or received
    symbols (BSC).
    """
    K = code.constraint_length
    symlen = code.symlen_out
    soft = channel == "awgn"
    esym_of, hard_dists, tx_select, dist_vec, snap = _stage_fns(code)

    def gen(gid, row, seed, param, taxis: int, stack_axis: int):
        """``taxis``: which axis of the broadcast result runs over symbol
        positions (0 for the kernels' [T, Bt] planes, 1 for the host's
        [N, T]); ``stack_axis``: where the soft-demap M axis goes."""
        live = row < L
        bits = jnp.where(live,
                         (coord_bits(gid, row, seed, 0) & 1).astype(jnp.int32),
                         0)
        # register plane via K shifted views along the symbol axis
        bplane = bits.astype(jnp.uint32)
        reg = bplane << (K - 1)
        for j in range(1, K):
            if taxis == 0:  # noqa: SIM108 — keep both layouts explicit
                shifted = jnp.concatenate(
                    [jnp.zeros((j,) + bplane.shape[1:], jnp.uint32),
                     bplane[:T - j]], axis=0)
            else:
                shifted = jnp.concatenate(
                    [jnp.zeros(bplane.shape[:1] + (j,), jnp.uint32),
                     bplane[:, :T - j]], axis=1)
            reg = reg | (shifted << (K - 1 - j))
        esym = esym_of(reg)
        if soft:
            u0 = coord_uniform(gid, row, seed, 1)
            u1 = coord_uniform(gid, row, seed, 2)
            r = jnp.sqrt(-2.0 * jnp.log(u0))
            theta = jnp.float32(_TWO_PI) * u1
            txi, txq = tx_select(esym)
            rxi = txi + param * (r * jnp.cos(theta))
            rxq = txq + param * (r * jnp.sin(theta))
            dvec = dist_vec(rxi, rxq)
            if demapper == "hard":
                sxi, sxq = snap(dvec)
                dvec = dist_vec(sxi, sxq)
            syms = jnp.stack(dvec, axis=stack_axis)
        else:
            fmask = jnp.zeros(esym.shape, jnp.uint32)
            for kk in range(symlen):
                fk = (coord_uniform(gid, row, seed, 1 + kk)
                      < param).astype(jnp.uint32)
                fmask = fmask | (fk << kk)
            syms = (esym ^ fmask).astype(jnp.int32)
        return bits, syms

    return gen


def frames_host(code: Code, gids: np.ndarray, seed: int, param: float,
                channel: str, demapper: str = "soft"):
    """Host replica: the exact (bits [N, L+K-1... T], syms) frames a
    sequential MC kernel generates for global frame ids ``gids`` — decode
    them with the XLA machines to cross-check kernel error counts."""
    T = code.num_block_symbols
    gen = make_datagen(code, T, code.block_length, channel, demapper)
    g = jnp.asarray(gids, jnp.int32)[:, None]
    t = jnp.arange(T)[None, :]
    bits, syms = gen(g, t, jnp.uint32(int(seed) & 0x7FFFFFFF),
                     jnp.float32(param), taxis=1, stack_axis=-1)
    return np.asarray(bits), np.asarray(syms)
