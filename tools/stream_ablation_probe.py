#!/usr/bin/env python3
"""Timing-only ablations of the streaming long-frame ACS row (PERF §2b).

The kernel sits at ~24% of its VPU-bound; this probe attributes the row
cost by swapping pieces of `_acs_row` / the pack step for same-shape
stand-ins (WRONG decodes — timing only):

  baseline      the real row
  no_deint      contiguous-half predecessor metrics (no reshape/relayout)
  no_pack       decision words replaced by a cheap constant sum
  no_select     branch metrics without the M-term select-tree
  static_load   dists_ref[0] instead of dists_ref[i] (dynamic VMEM slice)
  static_store  dec_ref[0] instead of dec_ref[i] (dynamic VMEM store)
  chunk512      baseline at a 512-row time chunk (raised vmem limit)

Protocol: K=7 soft, B=1024, T=16384 (the `..._b1024` bench shape), warm,
fresh pre-materialized inputs, one variant per run, decode-only timing.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import convolutional_codes_tpu.ops.longframe_pallas as lf     # noqa: E402
from convolutional_codes_tpu.models.codebook import get_code  # noqa: E402
from convolutional_codes_tpu.models.trellis import build_trellis  # noqa: E402

T, B, CALLS = 16384, 1024, 3


def fake_rows(variant):
    real_acs = lf._acs_row
    real_pack = lf._pack_rows

    def acs(trellis, hard, S, M):
        real = real_acs(trellis, hard, S, M)

        def row(metrics, bm, e0, e1):
            if variant == "no_deint":
                half = metrics[: S // 2]
                mp0 = jnp.concatenate([half, half], axis=0)
                mp1 = mp0
                b0 = e0[:, 0:1] * bm[0]
                b1 = e1[:, 0:1] * bm[0]
                for m in range(1, M):
                    b0 = b0 + e0[:, m:m + 1] * bm[m]
                    b1 = b1 + e1[:, m:m + 1] * bm[m]
                cand0 = mp0 + b0
                cand1 = mp1 + b1
                dec = cand1 < cand0
                return jnp.where(dec, cand1, cand0), dec
            if variant == "no_select":
                m2 = metrics.reshape(S // 2, 2, metrics.shape[-1])
                ev = m2[:, 0, :]
                od = m2[:, 1, :]
                mp0 = jnp.concatenate([ev, ev], axis=0)
                mp1 = jnp.concatenate([od, od], axis=0)
                cand0 = mp0 + bm[0]
                cand1 = mp1 + bm[1]
                dec = cand1 < cand0
                return jnp.where(dec, cand1, cand0), dec
            return real(metrics, bm, e0, e1)

        return row

    def pack(dec, S, nwords):
        if variant == "no_pack":
            s = jnp.sum(dec[:32].astype(jnp.int32), axis=0)
            return [s for _ in range(nwords)]
        return real_pack(dec, S, nwords)

    return acs, pack


def stream_acs_probe(trellis, dists_tmb, init_sb, chunk, variant):
    """Local copy of lf.stream_acs_pallas with load/store-index ablations
    and a raised scoped-vmem limit for big chunks (timing only)."""
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    T_, M, Bv = dists_tmb.shape
    S = trellis.num_states
    Bt = Bv
    E0, E1, nwords = lf._row_tables(trellis)
    row = lf._acs_row(trellis, False, S, M)
    nt = T_ // chunk

    def kernel(dists_ref, init_ref, e0_ref, e1_ref, fm_ref, dec_ref, m_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            m_scr[:] = init_ref[:]

        e0 = e0_ref[:]
        e1 = e1_ref[:]

        def body(i, metrics):
            li = 0 if variant == "static_load" else i
            new, dec = row(metrics, dists_ref[li], e0, e1)
            si = 0 if variant == "static_store" else i
            for w, word in enumerate(lf._pack_rows(dec, S, nwords)):
                dec_ref[si, w] = word
            return new

        metrics = jax.lax.fori_loop(0, chunk, body, m_scr[:])
        m_scr[:] = metrics
        fm_ref[:] = metrics

    fm, dec = pl.pallas_call(
        kernel,
        grid=(Bv // Bt, nt),
        in_specs=[
            pl.BlockSpec((chunk, M, Bt), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, Bt), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, M), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, Bt), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, nwords, Bt), lambda b, t: (t, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, Bv), jnp.float32),
            jax.ShapeDtypeStruct((T_, nwords, Bv), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((S, Bt), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(dists_tmb.astype(jnp.float32), init_sb.astype(jnp.float32),
      jnp.asarray(E0), jnp.asarray(E1))
    return fm, dec


def main():
    assert jax.default_backend() == "tpu"
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    code = get_code("nasa-k7")
    trellis = build_trellis(code)
    S, M = trellis.num_states, code.points_per_symbol
    chunk = 512 if variant == "chunk512" else 256

    if variant in ("no_deint", "no_pack", "no_select"):
        lf._acs_row, lf._pack_rows = fake_rows(variant)

    init = jnp.full((S, B), lf.BIG_METRIC, jnp.float32).at[0, :].set(0.0)

    @functools.partial(jax.jit, static_argnums=())
    def run(d):
        fm, dec = stream_acs_probe(trellis, d, init, chunk, variant)
        return fm.sum(dtype=jnp.float32), dec[0, 0, 0]

    key = jax.random.PRNGKey(0)
    ds = [jax.device_put(jax.random.uniform(jax.random.fold_in(key, i),
                                            (T, M, B), jnp.float32))
          for i in range(CALLS + 1)]
    jax.block_until_ready(ds)
    jax.block_until_ready(run(ds[0]))           # compile + warm
    t0 = time.time()
    for i in range(CALLS):
        jax.block_until_ready(run(ds[1 + i]))
    dt = time.time() - t0
    rows = T * B * CALLS
    print(json.dumps({
        "variant": variant, "chunk": chunk,
        "us_per_1024row": round(1e6 * dt / (T * CALLS), 3),
        "acs_bits_per_s": round(rows / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
