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
import os
import sys
import time

import jax

if os.environ.get("CONVCODES_CPU"):
    # the axon sitecustomize preimports jax on the TPU backend regardless of
    # JAX_PLATFORMS; this is the only reliable way to force a CPU run
    jax.config.update("jax_platforms", "cpu")


def _probe_backend(timeout_s: float = 240.0):
    """Bounded first-device-touch in a SUBPROCESS.  When the TPU tunnel
    relay is dead (CLAUDE.md), backend init blocks forever while holding
    the GIL (an in-process watchdog thread cannot fire) — probe out of
    process and fail fast with a diagnostic instead of hanging the
    driver.  Skipped for forced-CPU runs."""
    if os.environ.get("CONVCODES_CPU"):
        return "cpu"
    import subprocess
    try:
        # cheap positive check first: on this box a live tunnel relay
        # process means the backend will answer — skip the subprocess
        # probe (and its throwaway ~70 s tunnel warmup) entirely
        ps = subprocess.run(["ps", "-eo", "args"], capture_output=True,
                            text=True, timeout=10)
        if ".tpu_init.py" in ps.stdout:
            return "unprobed"
    except Exception:
        pass
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; import jax.numpy as jnp; "
             "jnp.zeros(8).block_until_ready(); "
             "print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0:
            return r.stdout.strip().splitlines()[-1]
        reason = (r.stderr or r.stdout).strip().splitlines()[-1:] or ["?"]
        reason = f"backend init failed: {reason[0]}"
    except subprocess.TimeoutExpired:
        reason = (f"backend init did not answer within {timeout_s}s "
                  "(TPU tunnel relay down?)")
    print(json.dumps({"metric": "bench_unavailable", "value": 0, "unit": "",
                      "detail": {"reason": reason}}), flush=True)
    os._exit(3)


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


def _emit(metric, bits, dt, baseline=None, **detail):
    r = {"metric": metric, "value": round(bits / dt, 1), "unit": "info_bits/s"}
    if baseline:
        r["vs_baseline"] = round(bits / dt / baseline, 3)
    if detail:
        r["detail"] = detail
    print(json.dumps(r), flush=True)


def _bench_longframe_fused(code_key, metric, channel, param, baseline,
                           window=1920, warmup=128, lanes=131072, nsteps=4,
                           calls=3):
    """BASELINE configs 0/2: fused long-frame Monte-Carlo chain
    (ops/fused_longframe.py) — every VPU lane advances its own coded
    stream through overlap-save windows, RNG/encode/channel/demap/ACS/
    traceback/count all VMEM-resident.  Mirrors the reference chains
    (binary-symmetric-channel/main.c:57-98, AWGN-channel/main.c:80-144)
    at streaming frame lengths the reference's uint8 block machinery
    cannot express."""
    from convolutional_codes_tpu.ops.fused_longframe import (
        mc_longframe_viterbi)

    code = get_code(code_key)

    @jax.jit
    def run(seed):
        be, we = mc_longframe_viterbi(code, lanes, nsteps, seed, param,
                                      channel=channel, window=window,
                                      warmup=warmup, block_lanes=1024)
        return be.sum(dtype=jnp.int32), we.sum(dtype=jnp.int32)

    jax.block_until_ready(run(jnp.int32(1)))       # compile + warm
    t0 = time.time()
    errs = 0
    for i in range(calls):                         # fresh seed per call:
        be, we = run(jnp.int32(100 + i))           # memoization-proof
        errs += int(be)
    dt = time.time() - t0
    bits = lanes * nsteps * window * calls
    _emit(metric, bits, dt, baseline, ber=errs / bits, window=window,
          warmup=warmup, stream_lanes=lanes)


def _bench_longframe(code_key, metric, hard, frame_bits, B, baseline,
                     calls=3):
    """Long-frame *decode-only* rate on materialized data — the reference's
    data-driven ``decoder_input`` use case (AWGN-channel/include/
    decoder.h:17-26) at streaming lengths.  Since round 5 this runs the
    EXACT streaming Pallas kernels (ops/longframe_pallas via
    long_frame_decode_stream): whole-frame ACS with metrics resident in
    VMEM scratch while the grid pipeline double-buffers the HBM distance
    stream, then a reverse-grid traceback — bit-identical to the
    monolithic decode (hardware-proven, tests/test_longframe_tpu.py).
    Distances are pre-materialized OUTSIDE the timed region (a decoder
    is not responsible for generating its own input), fresh per call so
    the backend's executable+input memoization cannot serve them; the
    timed region is transpose + decode + error count + scalar readback."""
    from convolutional_codes_tpu.ops.encoder import encode_stream
    from convolutional_codes_tpu.ops.viterbi import hard_branch_metrics
    from convolutional_codes_tpu.parallel.streaming import (
        long_frame_decode_stream)

    code = get_code(code_key)
    L = frame_bits - (code.constraint_length - 1)
    L -= (L + code.constraint_length - 1) % 256    # T divisible by chunk
    key = jax.random.PRNGKey(3)

    @jax.jit
    def gen(key):
        bits = jax.random.bernoulli(key, 0.5, (B, L)).astype(jnp.int32)
        syms = encode_stream(code, bits, terminate=True)
        if hard:
            kf = jax.random.split(key)[0]
            flips = jax.random.bernoulli(kf, 0.0125, syms.shape + (code.symlen_out,))
            fl = jnp.sum(flips.astype(jnp.int32)
                         << jnp.arange(code.symlen_out), -1)
            bm = hard_branch_metrics(code, syms ^ fl).astype(jnp.float32)
        else:
            sig = jnp.float32(awgn_sigma(6.0))
            from convolutional_codes_tpu.ops.channels import awgn
            from convolutional_codes_tpu.ops.demapper import soft_demap
            from convolutional_codes_tpu.ops.mapper import map_symbols
            bm = soft_demap(code.symlen_out,
                            awgn(jax.random.split(key)[1],
                                 map_symbols(code, syms), sig))
        return bits, bm

    dec = jax.jit(lambda bm: long_frame_decode_stream(code, bm, hard=hard))

    @jax.jit
    def errcount(out, bits):
        return jnp.sum(out[:, :L] != bits)

    datasets = [gen(jax.random.fold_in(key, i)) for i in range(calls + 1)]
    bits, bm = datasets[-1]
    _ = int(errcount(dec(bm), bits))               # compile ALL stages warm
    t0 = time.time()
    err = 0
    for i in range(calls):
        bits, bm = datasets[i]
        err += int(errcount(dec(bm), bits))        # sync readback per call
    dt = time.time() - t0
    _emit(metric, calls * B * L, dt, baseline, frame_bits=L,
          ber=err / (calls * B * L))


def _bench_seq(code_key, decoder, metric, snr_db, baseline, B=131072,
               timeout=10000):
    from convolutional_codes_tpu.sim.sweep import (
        SweepSpec, _sequential_host_accumulate)

    code = _resolve_code(code_key)
    spec = SweepSpec(code=code, channel="awgn", decoder=decoder,
                     demapper="soft", frames_per_step=B,
                     timeout_per_bit=timeout)
    param = float(awgn_sigma(snr_db))
    # warm (compiles + first-readback)
    _sequential_host_accumulate(code, spec, param, 1, jax.random.PRNGKey(5), 0)
    t0 = time.time()
    be, fe, nb = _sequential_host_accumulate(
        code, spec, param, 2, jax.random.PRNGKey(6), 1)
    dt = time.time() - t0
    _emit(metric, nb, dt, baseline, snr_db=snr_db, ber=be / nb)


def _bench_streaming_per_chip(metric, B=128, T=65536, snr_db=4.0, calls=3):
    """Per-chip rate of the multi-chip streaming decoder's shard body:
    streaming_viterbi_decode on a 1-device 'seq' mesh with the VMEM
    Pallas ACS backend (parallel/streaming.py) — the number a v5e pod
    slice scales by along the seq axis."""
    from convolutional_codes_tpu.ops.channels import awgn
    from convolutional_codes_tpu.ops.demapper import soft_demap
    from convolutional_codes_tpu.ops.encoder import encode_stream
    from convolutional_codes_tpu.ops.mapper import map_symbols
    from convolutional_codes_tpu.parallel.mesh import make_mesh
    from convolutional_codes_tpu.parallel.streaming import (
        streaming_viterbi_decode)

    code = get_code("nasa-k7")
    mesh = make_mesh({"seq": 1}, devices=jax.devices()[:1])
    L = T - (code.constraint_length - 1)

    @jax.jit
    def gen(key):
        kb, kn = jax.random.split(key)
        bits = jax.random.bernoulli(kb, 0.5, (B, L)).astype(jnp.int32)
        syms = encode_stream(code, bits, terminate=True)
        return soft_demap(code.symlen_out,
                          awgn(kn, map_symbols(code, syms),
                               jnp.float32(awgn_sigma(snr_db))))

    dec = lambda d: streaming_viterbi_decode(code, d, mesh, warmup=128,
                                             backend="pallas")
    key = jax.random.PRNGKey(9)
    # distances pre-materialized outside the timed region, fresh per call
    # (round 5: the old loop timed gen's encode_stream scan, not the
    # decoder — same hygiene as _bench_longframe)
    datasets = [gen(jax.random.fold_in(key, i)) for i in range(calls)]
    _ = int(dec(gen(key))[0, 0])                   # compile + warm
    t0 = time.time()
    for i in range(calls):
        _ = int(dec(datasets[i])[0, 0])
    dt = time.time() - t0
    _emit(metric, calls * B * L, dt, None, backend="pallas_shard_map")


def _resolve_code(code_key):
    return code_key if not isinstance(code_key, (int, str)) else get_code(code_key)


def _bench_streaming_fused_per_chip(metric, lanes=131072, windows=4,
                                    snr_db=6.0, calls=3):
    """Per-chip rate of the sequence-parallel FUSED streaming mode
    (parallel/streaming.streaming_mc_accumulate on a 1-device 'seq' mesh):
    each device decodes a distinct time range of the same coded streams
    with locally regenerated halos, so the shard body runs at the fused
    kernel's rate — the number a pod slice scales by along the seq axis
    (one psum of per-lane counters per call is the only collective).
    Work shape matches the monolithic `awgn_soft_viterbi_k7_streaming`
    row so the two are directly comparable: the round-5 2x2 probe
    (tools/shard_overhead_probe.py) measured the shard_map wrapper at
    0.4-0.5% and the old (65536, 2) call shape at -9% amortization —
    the round-4 29% gap was a transient worker degradation, not
    sharding cost (PERF §3c)."""
    from convolutional_codes_tpu.parallel.mesh import make_mesh
    from convolutional_codes_tpu.parallel.streaming import (
        streaming_mc_accumulate)

    code = get_code("nasa-k7")
    mesh = make_mesh({"seq": 1}, devices=jax.devices()[:1])
    param = float(awgn_sigma(snr_db))
    be, we, nb = streaming_mc_accumulate(code, lanes, windows, 1, param,
                                         mesh)                  # warm
    t0 = time.time()
    errs = 0
    for i in range(calls):
        be, we, nb2 = streaming_mc_accumulate(code, lanes, windows, 100 + i,
                                              param, mesh)
        errs += int(jnp.sum(be))
    dt = time.time() - t0
    _emit(metric, nb * calls, dt, None, ber=errs / (nb * calls),
          backend="fused_seq_shard")


def _bench_fano_mc(code_key, metric, snr_db, baseline, lanes=1024, fpl=64,
                   timeout=10000, **extra):
    """Fano rows via the fused MC kernel with in-kernel lane refill
    (ops/fano_mc.py): a finished lane banks its counts and hash-generates
    its next frame inside the kernel, so the lockstep tile pays per-lane
    mean work, not the max of 128 single-frame walks."""
    from convolutional_codes_tpu.ops.fano_mc import mc_fano

    code = _resolve_code(code_key)
    param = float(awgn_sigma(snr_db))
    mc_fano(code, lanes, max(1, fpl // 8), 1, param, block_lanes=128,
            timeout_per_bit=timeout)                       # compile + warm
    t0 = time.time()
    be, fe, nb = mc_fano(code, lanes, fpl, 4242, param, block_lanes=128,
                         timeout_per_bit=timeout)
    dt = time.time() - t0
    _emit(metric, nb, dt, baseline, snr_db=snr_db, ber=be / nb,
          frames=lanes * fpl, **extra)


def _bench_stack_mc(code_key, metric, snr_db, baseline, lanes=1024, fpl=64,
                    **extra):
    """Stack rows via the fused MC kernel (ops/stack_mc.py) — the
    production sweep path for T*M <= 1024 stack configs since round 4."""
    from convolutional_codes_tpu.ops.stack_mc import mc_stack

    code = _resolve_code(code_key)
    param = float(awgn_sigma(snr_db))
    mc_stack(code, lanes, max(1, fpl // 8), 1, param)  # compile + warm (auto tile)
    t0 = time.time()
    be, fe, nb = mc_stack(code, lanes, fpl, 4242, param)
    dt = time.time() - t0
    _emit(metric, nb, dt, baseline, snr_db=snr_db, ber=be / nb,
          frames=lanes * fpl, **extra)


def _bench_acs(code_key, metric, B=262144, nsteps=8):
    """Decode-only Pallas ACS+traceback rate (PERF.md §2): per-step fresh
    random distance tensors generated in-jit (~1 uniform/element, ~10% of
    the decode cost), nsteps decodes scanned inside one dispatch so the
    tunnel's per-dispatch latency cannot dominate."""
    from convolutional_codes_tpu.ops.viterbi import viterbi_decode_soft

    code = get_code(code_key)
    T = code.block_length + code.constraint_length - 1
    M = 1 << code.symlen_out

    @jax.jit
    def many(key):
        def body(acc, i):
            d = jax.random.uniform(jax.random.fold_in(key, i), (B, T, M),
                                   jnp.float32, 0.0, 8.0)
            bits = viterbi_decode_soft(code, d)
            return acc + jnp.sum(bits[:, 0], dtype=jnp.int32), None
        acc, _ = jax.lax.scan(body, jnp.int32(0),
                              np.arange(nsteps, dtype=np.int32))
        return acc

    _ = int(many(jax.random.PRNGKey(7)))            # compile + warm
    t0 = time.time()
    _ = int(many(jax.random.PRNGKey(8)))
    dt = time.time() - t0
    _emit(metric, B * code.block_length * nsteps, dt, None,
          includes_ingen=True)


def bench_all():
    """One JSON line per BASELINE.json config (0-4), headline last."""
    # decode-only ACS kernel rate (PERF.md roofline row)
    _bench_acs(0, "acs_pallas_k3")
    # config 0: K=3 (7,5) hard Viterbi, BSC, million-bit streaming frames.
    # BASELINE.json names the classic non-catastrophic (7,5) code here —
    # reference code 0 (101,011) is catastrophic (shared (1+D) factor) and
    # only usable on short terminated blocks, not million-bit streams.
    # Fused chain: 1.57e9 bits per timed region, ~5.4e9 bits/s measured.
    _bench_longframe_fused("k3-75", "bsc_hard_viterbi_k3_1e6bit_frames",
                           "bsc", 0.0125, baseline=9.4e6)
    # config 2: K=7 NASA soft Viterbi, long streaming frames (fused chain)
    _bench_longframe_fused("nasa-k7", "awgn_soft_viterbi_k7_streaming",
                           "awgn", float(awgn_sigma(6.0)), baseline=None,
                           lanes=65536, nsteps=2)
    # real-data decode-only rate for the same streaming configuration:
    # distances materialized in HBM, EXACT streaming-kernel decode (round
    # 5; supersedes the windowed-XLA awgn_k7_longframe_decode_xla row,
    # which measured 7.4e6 bits/s — PERF §2b keeps the comparison)
    _bench_longframe("nasa-k7", "awgn_k7_longframe_decode_stream", False,
                     frame_bits=1 << 16, B=128, baseline=None)
    # same decoder at a production batch (server load): fatter VPU tiles
    _bench_longframe("nasa-k7", "awgn_k7_longframe_decode_stream_b1024",
                     False, frame_bits=1 << 14, B=1024, baseline=None)
    # per-chip rate of the multi-chip streaming shard body (Pallas ACS
    # under shard_map; scales along the seq axis on a pod slice)
    _bench_streaming_per_chip("awgn_k7_streaming_shard_per_chip")
    # per-chip rate of the sequence-parallel FUSED streaming mode (time
    # ranges sharded, halos regenerated locally — no ppermute on the hot
    # path; the distance-fed row above remains for real received data)
    _bench_streaming_fused_per_chip("awgn_k7_streaming_fused_per_chip")
    # Sequential rows.  Baselines are HONEST same-config same-SNR rates of
    # the freshly compiled C chain on one Xeon core — measured via
    # tools/bench_reference_ext.py (results/reference_fresh_awgn_ext.json);
    # round 3 wrongly normalized the K=9/K=15 rows by the K=3 core's rate.
    # The C parity routine is the compat quirk (SURVEY §2c), which REWIRES
    # the extension codes (quirk taps hit the K=9/K=15 polynomials), so
    # ratio rows run parity=compat on BOTH sides; the true-parity
    # production rows carry no C baseline (the reference cannot express
    # those codes).
    from convolutional_codes_tpu.models.codebook import PARITY_COMPAT

    # config 3: stack on K=9, AWGN soft — production MC kernel path
    _bench_stack_mc("k9-r12", "awgn_stack_k9_soft", 8.0, None, lanes=4096,
                    fpl=2048)
    _bench_stack_mc(get_code("k9-r12").replace(parity=PARITY_COMPAT),
                    "awgn_stack_k9_soft_compat_vs_c", 8.0, 3.96e5,
                    lanes=4096, fpl=128, parity="compat")
    # flagship-code sequential rows (code 0 is quirk-free: compat == true)
    _bench_stack_mc(0, "awgn_stack_k3_soft", 8.0, 4.12e6, lanes=4096,
                    fpl=4096)
    # pool-path stack row kept for the measured MC-vs-pool comparison
    _bench_seq(0, "stack", "awgn_stack_k3_soft_pool", 8.0, 4.12e6)
    _bench_fano_mc(0, "awgn_fano_k3_soft", 8.0, 7.22e5, lanes=1024, fpl=512)
    # config 4: fano on K=15 + 16-QAM soft demapper via the MC kernel
    # (production path since round 4: 7.4e7 bits/s @ 14 dB vs the pool's
    # 5.6e6 — the round-3 pool preference was an artifact of the mistuned
    # weight).  The compat twin runs the quirk-rewired code the C binary
    # simulates (heavy-tailed walks, BER 1.2e-2 at 14 dB).
    _bench_fano_mc("k15-r14-16qam", "awgn_fano_k15_16qam", 14.0, None,
                   lanes=1024, fpl=2048)
    _bench_fano_mc(get_code("k15-r14-16qam").replace(parity=PARITY_COMPAT),
                   "awgn_fano_k15_16qam_compat_vs_c", 14.0, 1.11e6,
                   lanes=1024, fpl=24, parity="compat")
    # headline variant row: the fast_demap linear-form demapper (PERF
    # §1b) — statistical contract (z-tested), measured +3.2% over the
    # bit-exact headline; recorded so the fastest supported configuration
    # is an artifact, not just a probe log
    _bench_headline_variant("awgn_soft_viterbi_k3_full_chain_fast_demap",
                            "fast_demap")


def _bench_headline_variant(metric, variant, calls=4):
    from convolutional_codes_tpu.ops.fused_chain import mc_chain_viterbi

    code = get_code(0)
    B, nsteps = 1048576, 16
    sigma = jnp.float32(awgn_sigma(8.0))

    @jax.jit
    def many(seed):
        be, fe = mc_chain_viterbi(code, B, nsteps, seed, sigma,
                                  block_lanes=1024, variant=variant)
        return be.sum(dtype=jnp.int32)

    _ = int(many(jnp.int32(1)))                    # compile + warm
    t0 = time.time()
    errs = [many(jnp.int32(700 + i)) for i in range(calls)]
    jax.block_until_ready(errs)
    dt = time.time() - t0
    bits = B * code.block_length * nsteps * calls
    _emit(metric, bits, dt, BASELINE_BITS_PER_S,
          ber=sum(int(e) for e in errs) / bits, variant=variant)


def main():
    _probe_backend()
    if "--all" in sys.argv:
        if jax.default_backend() == "tpu":
            bench_all()
        else:
            print(json.dumps({"metric": "bench_all_skipped",
                              "value": 0, "unit": "",
                              "detail": {"reason": "TPU-only Pallas paths; "
                                         f"backend={jax.default_backend()}"}}),
                  flush=True)
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
