#!/usr/bin/env python
"""Localhost multi-process ensemble throughput (VERDICT r3 #7: the best-
available weak-scaling proxy without real multi-chip hardware).

Launches 1-process then 2-process jax.distributed ensemble runs on the CPU
backend (same per-process replica count) and reports both rates.  CAVEAT,
stated in the artifact: the two processes SHARE this container's 2 CPU
cores, so the 2-process point measures the distributed machinery's
overhead (coordination, global-mesh compilation, cross-process dispatch),
NOT compute scaling — on real hardware each process owns its own chips and
the trajectories are communication-free (see REPLICA_SCALING_r04.json for
the per-chip dispatch-overhead bound).

Usage: python scripts/run_distributed_bench.py --out DISTRIBUTED_BENCH.json
"""
import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(nproc, port, reps_per_host, steps, repeats, tag):
    procs = []
    outs = []
    for pid in range(nproc):
        out = f"/tmp/distbench_{tag}_{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             "--pid", str(pid), "--nproc", str(nproc), "--port", str(port),
             "--out", out, "--replicas-per-host", str(reps_per_host),
             "--steps", str(steps), "--bench-repeats", str(repeats)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL))
    for p in procs:
        assert p.wait(timeout=1800) == 0, f"worker failed ({tag})"
    with open(outs[0]) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas-per-host", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    one = run(1, 12395, args.replicas_per_host, args.steps, args.repeats, "p1")
    two = run(2, 12396, args.replicas_per_host, args.steps, args.repeats, "p2")
    r1 = one["bench"]["replica_steps_per_s"]
    r2 = two["bench"]["replica_steps_per_s"]
    report = {
        "caveat": "localhost, 2 processes sharing 2 CPU cores: measures "
                  "distributed-machinery overhead, not compute scaling; "
                  "real-slice recipe in BENCH_NOTES.md",
        "one_process": one["bench"],
        "two_process": two["bench"],
        "two_vs_one_total_rate": r2 / r1,
        "real_slice_recipe": (
            "per host i of N: python scripts/distributed_worker.py "
            "--pid i --nproc N --port <coord> --replicas-per-host 512 "
            "--steps 5000 --bench-repeats 3 (drop the cpu force inside "
            "the worker on a real slice)"),
    }
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")


if __name__ == "__main__":
    main()
