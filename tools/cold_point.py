"""Cold re-measurement of a full-scale sweep point (BASELINE.md
"cold-point methodology"): warm the executable with a 1-step run, then time
the full point with a fresh never-recorded seed.  A different seed means
different inputs, so backend executable+input memoization cannot serve the
result — any throughput measured here is genuine compute.

Run on the TPU: PYTHONPATH=. python tools/cold_point.py [seed]"""
import sys
import json, time
import jax
from convolutional_codes_tpu.models.codebook import get_code
from convolutional_codes_tpu.parallel.montecarlo import fused_mc_accumulate

code = get_code(0)
batch = 262144
# warmup: compile + tunnel
fused_mc_accumulate(code, 1, 7, 0.0125, batch, channel="bsc", demapper="soft")
t0 = time.time()
nsteps = 77   # ~8.07e8 bits, matches the recorded point
seed = int(sys.argv[1]) if len(sys.argv) > 1 else 987654321
be, fe, nb = fused_mc_accumulate(code, nsteps, seed, 0.0125, batch,
                                 channel="bsc", demapper="soft")
wall = time.time() - t0
print(json.dumps({"bits": nb, "ber": be / nb, "bits_per_s": nb / wall,
                  "wall_s": wall, "seed": seed}), flush=True)
