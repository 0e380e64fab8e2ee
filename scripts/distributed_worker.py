#!/usr/bin/env python
"""One process of a multi-process ensemble run (SURVEY.md §4 "multi-process
simulation with jax.distributed.initialize on localhost ports").

Each process owns `--replicas-per-host` replicas (seeded by process index
via host_local_ensemble), joins the ('dp',) global mesh spanning all
processes' devices, advances the ensemble `--steps` steps SPMD, and
process 0 writes summary statistics.  tests/test_distributed.py launches
two of these on localhost and asserts the merged kinetics equal a single-
process run of the same replica blocks bitwise (collectives and vmapped
trajectories are deterministic).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # the container force-registers
#                                             the TPU backend; see CLAUDE.md


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas-per-host", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bench-repeats", type=int, default=0,
                    help="after the warmup chunk, time this many more "
                         "chunks and report global replica-steps/s "
                         "(VERDICT r3 #7: the localhost 2-process "
                         "throughput point)")
    args = ap.parse_args()

    # join the runtime BEFORE importing kmc_tpu: module-level jnp constants
    # would initialize the XLA backend, which must happen after initialize()
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{args.port}",
                               num_processes=args.nproc,
                               process_id=args.pid)
    assert jax.process_count() == args.nproc

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.distributed import host_local_ensemble
    from kmc_tpu.parallel.ensemble import make_ensemble_chunk

    cfg = SimConfig(n_a=24, n_b=8, cell_range_x=2000.0, cell_range_y=2000.0,
                    cell_range_z=600.0, fused_align=False)
    state = host_local_ensemble(cfg, args.replicas_per_host, seed=args.seed)
    chunk = make_ensemble_chunk(cfg, args.steps, donate=True)
    state, obs = chunk(state)

    bench = None
    if args.bench_repeats:
        import time

        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(args.bench_repeats):
            state, obs = chunk(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        glob = args.replicas_per_host * args.nproc
        bench = {
            "nproc": args.nproc,
            "replicas_global": glob,
            "steps_timed": args.bench_repeats * args.steps,
            "replica_steps_per_s": glob * args.bench_repeats * args.steps / dt,
        }

    # fully-replicated reductions are addressable on every process
    import jax.numpy as jnp

    stats = jax.jit(
        lambda s, o: {
            "bond_sum": jnp.sum(o.bond_num),
            "xy_checksum": jnp.sum(s.a_xy.astype(jnp.float64)),
            "step": jnp.max(s.step),
        }
    )(state, obs)
    stats = {k: float(v) for k, v in stats.items()}
    stats["replicas_global"] = args.replicas_per_host * args.nproc
    if bench is not None:
        stats["bench"] = bench

    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(stats, f)
    print(f"pid={args.pid} {stats}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
