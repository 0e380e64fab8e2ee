"""Profiling and throughput metering (SURVEY.md §5 "tracing/profiling").

The reference has no timers at all (its only <chrono> use seeds the RNG,
main.cpp:2316).  Here the north-star counter — KMC event attempts/s — is a
first-class meter, plus a thin wrapper over jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

from kmc_tpu.config import SimConfig


def events_per_step(cfg: SimConfig) -> int:
    """Event attempts per particle-engine timestep (BASELINE.md):
    molecule moves + trans pair tests + ordered cis pair tests."""
    return cfg.n + cfg.n_a * cfg.n_b * 3 + 2 * cfg.n_a * (cfg.n_a - 1)


@dataclass
class ThroughputMeter:
    """Accumulates (steps, replicas) work items and reports rates."""

    cfg: SimConfig
    t0: float = field(default_factory=time.perf_counter)
    steps: int = 0

    def add(self, n_steps: int, n_replicas: int = 1) -> None:
        self.steps += n_steps * n_replicas

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def steps_per_s(self) -> float:
        return self.steps / max(self.elapsed, 1e-9)

    @property
    def events_per_s(self) -> float:
        return self.steps_per_s * events_per_step(self.cfg)

    def report(self) -> dict:
        return {
            "steps": self.steps,
            "elapsed_s": self.elapsed,
            "steps_per_s": self.steps_per_s,
            "events_per_s": self.events_per_s,
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace scope; view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_blocked(fn, *args):
    """(result, seconds) with block_until_ready."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
