#!/usr/bin/env python
"""Time eager vs lazy (event-driven) alignment on TPU.

The lazy ensemble chunk (parallel/ensemble.py:make_lazy_ensemble_chunk)
aligns only the K dirtiest replicas per step; its cost is deterministic in
K (static gather), so the bench from a fresh init is representative.
Prints one JSON line per config.  Run exclusively (one TPU process).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPLICAS = int(os.environ.get("KMC_BENCH_REPLICAS", "256"))
CHUNK = 20
REPEATS = 3


def run(mode: str, k_align=None):
    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import (
        init_ensemble, make_ensemble_chunk, make_lazy_ensemble_chunk)

    cfg = SimConfig()
    events_per_step = cfg.n + cfg.n_a * cfg.n_b * 3 + 2 * cfg.n_a * (cfg.n_a - 1)
    state = init_ensemble(cfg, REPLICAS, seed=0)
    state = jax.block_until_ready(state)
    if mode == "eager":
        chunk = make_ensemble_chunk(cfg, CHUNK, donate=True)
    else:
        chunk = make_lazy_ensemble_chunk(cfg, CHUNK, k_align=k_align,
                                         donate=True)

    t0 = time.perf_counter()
    state, obs = chunk(state)
    state = jax.block_until_ready(state)
    print(f"# mode={mode} k={k_align} compile+first-chunk: "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        state, obs = chunk(state)
    state = jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps = REPEATS * CHUNK
    ms = dt / steps * 1000.0
    evs = steps * REPLICAS * events_per_step / dt
    print(json.dumps({"mode": mode, "k_align": k_align,
                      "replicas": REPLICAS, "ms_per_step": round(ms, 3),
                      "events_per_s": f"{evs:.3e}"}), flush=True)


if __name__ == "__main__":
    print(f"# backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    run("eager")
    run("lazy", REPLICAS // 4)
    run("lazy", REPLICAS // 8)
