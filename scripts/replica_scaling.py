#!/usr/bin/env python
"""Replica-scaling curve of the shipped lazy ensemble step (VERDICT r3 #3:
refresh BASELINE config 4 = 16,384 replicas in the shipped mode; r3 #7:
host-dispatch overhead vs replica count — the only plausible weak-scaling
limiter for communication-free trajectory-ensemble DP).

For each replica count: in-scan per-step time (chunked scan, no host
round-trip per step) AND per-dispatch host overhead (single-step jitted
call minus in-scan time), the quantity that bounds multi-chip weak scaling.

Usage: python scripts/replica_scaling.py [--counts 64,512,4096,16384]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="64,512,4096,16384")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import (init_ensemble,
                                           make_lazy_ensemble_chunk)

    cfg = SimConfig()
    events_per_step = (
        cfg.n + cfg.n_a * cfg.n_b * 3 + 2 * cfg.n_a * (cfg.n_a - 1)
    )
    rows = []
    for r in [int(x) for x in args.counts.split(",")]:
        state = jax.block_until_ready(init_ensemble(cfg, r, seed=0))
        chunk = make_lazy_ensemble_chunk(cfg, args.chunk,
                                         k_align=max(r // 8, 32),
                                         donate=True)
        state, _ = chunk(state)
        state = jax.block_until_ready(state)              # compile+warm
        reps = 3 if r <= 4096 else 2
        t0 = time.perf_counter()
        for _ in range(reps):
            state, _ = chunk(state)
        state = jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / reps
        ms_step = dt / args.chunk * 1000.0

        # per-dispatch overhead: a 1-step chunk includes one full host
        # dispatch+sync; subtract the in-scan step time
        one = make_lazy_ensemble_chunk(cfg, 1, k_align=max(r // 8, 32),
                                       donate=True)
        state, _ = one(state)
        state = jax.block_until_ready(state)
        t0 = time.perf_counter()
        n1 = 20
        for _ in range(n1):
            state, _ = one(state)
        state = jax.block_until_ready(state)
        d1 = (time.perf_counter() - t0) / n1 * 1000.0
        row = {
            "replicas": r,
            "ms_per_step_inscan": round(ms_step, 3),
            "replica_steps_per_s": round(r * args.chunk / dt),
            "events_per_s": r * args.chunk * events_per_step / dt,
            "ms_per_dispatch_total": round(d1, 3),
            "ms_dispatch_overhead": round(max(d1 - ms_step, 0.0), 3),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(rows, indent=1) + "\n")


if __name__ == "__main__":
    main()
