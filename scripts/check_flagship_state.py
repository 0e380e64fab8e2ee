#!/usr/bin/env python
"""Run the race-detection invariants (utils/checks.py) over EVERY replica
of a persisted validation ensemble state — deep-horizon evidence that the
parallel event application never corrupted topology, overlap exclusion,
or counters across millions of steps.

Usage: python scripts/check_flagship_state.py --state /tmp/val_r05_state.npz \
           [--out INVARIANTS_r05.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # read-only analysis: stay off TPU

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--state", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble
    from kmc_tpu.utils.checks import (
        counters_consistent, no_cross_cluster_overlap, topology_mutual)

    cfg = SimConfig()
    z = np.load(args.state)
    template = init_ensemble(cfg, 1, seed=0)     # structure only
    flat, treedef = jax.tree.flatten(template)
    leaves = []
    for i, ref in enumerate(flat):
        data = jnp.asarray(z[f"leaf{i}"])
        if jax.dtypes.issubdtype(ref.dtype, jax.dtypes.prng_key):
            data = jax.random.wrap_key_data(data)
        leaves.append(data)
    state = jax.tree.unflatten(treedef, leaves)
    reps = state.step.shape[0]

    @jax.jit
    def checks(st):
        f = lambda s: jnp.stack([
            topology_mutual(s, cfg),
            no_cross_cluster_overlap(s, cfg),
            counters_consistent(s, cfg),
        ])
        return jax.vmap(f)(st)                   # [reps, 3] bools

    ok = np.asarray(checks(state))
    report = {
        "state": args.state,
        "k_done_outputs": int(z["k_done"]),
        "steps_per_replica": int(np.max(np.asarray(state.step))) - 1,
        "replicas": int(reps),
        "topology_mutual_all": bool(ok[:, 0].all()),
        "no_cross_cluster_overlap_all": bool(ok[:, 1].all()),
        "counters_consistent_all": bool(ok[:, 2].all()),
        "failing_replicas": [int(i) for i in np.where(~ok.all(1))[0]],
        "ok": bool(ok.all()),
    }
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
