#!/usr/bin/env python
"""Weak-scaling benchmark harness (SURVEY.md §7 stage 7; BASELINE target:
>= 85% efficiency 1 -> N workers).

Holds replicas-per-device constant and measures ensemble throughput over
1, 2, 4, ... devices of the current platform.  Trajectories are
embarrassingly parallel, so the only scaling losses are dispatch overhead
and collective-free partitioning — this harness quantifies exactly that.

On the 8-virtual-CPU test platform it validates the machinery; on a real
multi-chip slice the same script produces the headline efficiency number.

  python scripts/weak_scaling.py [--per-device 64] [--chunk 50] [--steps 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual-CPU platform")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk
    from kmc_tpu.utils.profiling import events_per_step

    cfg = SimConfig()
    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= len(devices)]
    results = []
    base_rate = None
    for n in sizes:
        reps = args.per_device * n
        mesh = Mesh(np.asarray(devices[:n]), ("dp",))
        sh = NamedSharding(mesh, P("dp"))
        state = init_ensemble(cfg, reps, seed=0)
        state = jax.tree.map(lambda x: jax.device_put(x, sh), state)
        chunk = make_ensemble_chunk(cfg, args.chunk, donate=True)
        state, _ = chunk(state)                   # warm / compile
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            state, _ = chunk(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        rate = args.repeats * args.chunk * reps / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        results.append({
            "devices": n,
            "replicas": reps,
            "replica_steps_per_s": rate,
            "events_per_s": rate * events_per_step(cfg),
            "efficiency": eff,
        })
        print(f"# {n} devices: {rate:,.0f} replica-steps/s, eff {eff:.2%}",
              file=sys.stderr)
    print(json.dumps({"weak_scaling": results}, indent=1))


if __name__ == "__main__":
    main()
