#!/usr/bin/env python
"""Time the particle-engine step on TPU with fused_align off vs on.

Writes one line per config: {"fused": bool, "ms_per_step": float,
"events_per_s": float}.  Run exclusively (one TPU process at a time).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPLICAS = 256
CHUNK = 20
REPEATS = 3


def run(fused: bool):
    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk

    cfg = SimConfig(fused_align=fused)
    events_per_step = cfg.n + cfg.n_a * cfg.n_b * 3 + 2 * cfg.n_a * (cfg.n_a - 1)
    state = init_ensemble(cfg, REPLICAS, seed=0)
    state = jax.block_until_ready(state)
    chunk = make_ensemble_chunk(cfg, CHUNK, donate=True)

    t0 = time.perf_counter()
    state, obs = chunk(state)
    state = jax.block_until_ready(state)
    print(f"# fused={fused} compile+first-chunk: "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        state, obs = chunk(state)
    state = jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps = REPEATS * CHUNK
    ms = dt / steps * 1000.0
    evs = steps * REPLICAS * events_per_step / dt
    print(json.dumps({"fused": fused, "ms_per_step": round(ms, 3),
                      "events_per_s": f"{evs:.3e}"}), flush=True)
    return ms


if __name__ == "__main__":
    print(f"# backend: {jax.default_backend()}", file=sys.stderr, flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("base", "both"):
        run(False)
    if which in ("fused", "both"):
        run(True)
