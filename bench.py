#!/usr/bin/env python
"""Benchmark: ensemble KMC event-attempt throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Definition of an event attempt (BASELINE.md "event attempts per step", from
the reference workload main.cpp:577, 1877-2058): per replica per timestep,
  n molecule-move attempts
  + n_a * n_b * 3 trans-association pair tests
  + 2 * n_a * (n_a - 1) cis-association pair tests.
The reference performs exactly these attempts serially on one CPU core;
``vs_baseline`` is measured TPU attempts/s divided by the measured
single-core attempts/s of the compiled reference (BASELINE_MEASURED.json,
produced by scripts/measure_reference.sh).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from kmc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()  # round-2 lesson: cold driver run must not recompile

import jax

REPLICAS = int(os.environ.get("KMC_BENCH_REPLICAS", "512"))
CHUNK = int(os.environ.get("KMC_BENCH_CHUNK", "50"))
REPEATS = int(os.environ.get("KMC_BENCH_REPEATS", "3"))
# "lazy" = event-driven alignment (align only the k = replicas/8 dirtiest
# replicas per step; statistically validated in tests/test_lazy_align.py —
# bitwise == eager at k = replicas, kinetics inside the eager ensemble
# spread at k = replicas/8 with no starved replica).  "eager" restores the
# align-everything step.
MODE = os.environ.get("KMC_BENCH_MODE", "lazy")


def main():
    t_start = time.perf_counter()

    def mark(what):
        print(f"# t+{time.perf_counter() - t_start:7.1f}s  {what}",
              file=sys.stderr, flush=True)

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import (
        init_ensemble, make_ensemble_chunk, make_lazy_ensemble_chunk)

    mark("imports done")
    jax.devices()
    mark("backend up")

    cfg = SimConfig()  # reference scale: 150 receptors + 50 ligands
    events_per_step = (
        cfg.n + cfg.n_a * cfg.n_b * 3 + 2 * cfg.n_a * (cfg.n_a - 1)
    )

    state = init_ensemble(cfg, REPLICAS, seed=0)
    state = jax.block_until_ready(state)
    mark("init_ensemble done")
    if MODE == "lazy":
        chunk = make_lazy_ensemble_chunk(cfg, CHUNK,
                                         k_align=max(REPLICAS // 8, 32),
                                         donate=True)
    else:
        chunk = make_ensemble_chunk(cfg, CHUNK, donate=True)

    # warmup / compile
    state, obs = chunk(state)
    state = jax.block_until_ready(state)
    mark("warmup chunk done")

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        state, obs = chunk(state)
    state = jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps = REPEATS * CHUNK * REPLICAS
    events_per_s = steps * events_per_step / dt

    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref = base.get("reference_events_per_s")
        if ref:
            vs = events_per_s / ref
    print(json.dumps({
        "metric": "kmc_event_attempts_per_s",
        "value": events_per_s,
        "unit": "events/s/chip",
        "vs_baseline": vs,
    }))
    print(
        f"# mode={MODE} {REPLICAS} replicas x {REPEATS * CHUNK} steps in "
        f"{dt:.2f}s ({steps / dt:,.0f} replica-steps/s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
