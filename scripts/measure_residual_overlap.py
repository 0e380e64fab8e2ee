#!/usr/bin/env python
"""Measure the residual-overlap rate of the UNROLLED collision cleanup
(VERDICT r2 #6): with sweep_exact_cleanup=False, a revert chain deeper
than 3 could commit a step with a cross-cluster overlap.  diffuse(diag=True)
flags exactly that event (one extra fixpoint probe of the cleanup body);
this script accumulates the flag over a large replica-ensemble run at the
reference config and at a 4x-denser variant.

  python scripts/measure_residual_overlap.py [--replicas 256]
      [--chunks 20] [--chunk-steps 500] [--dense] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--replicas", type=int, default=256)
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--chunk-steps", type=int, default=500)
    ap.add_argument("--dense", action="store_true",
                    help="half the box in x/y (4x area density)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kmc_tpu.config import SimConfig
    from kmc_tpu.engine.step import step_fn_diag
    from kmc_tpu.parallel.ensemble import init_ensemble

    kw = {}
    if args.dense:
        kw = dict(cell_range_x=2886.5, cell_range_y=2886.5)
    cfg = SimConfig(sweep_exact_cleanup=False, **kw)

    @jax.jit
    def chunk(state):
        def inner(st, _):
            st2, obs, dg = jax.vmap(lambda s: step_fn_diag(s, cfg))(st)
            return st2, dg["residual_overlap"]

        state, res = jax.lax.scan(inner, state, None,
                                  length=args.chunk_steps)
        return state, jnp.sum(res)

    state = init_ensemble(cfg, args.replicas, seed=args.seed)
    total = 0
    for k in range(args.chunks):
        state, r = chunk(state)
        total += int(r)
        print(f"# chunk {k + 1}/{args.chunks}: cumulative residual "
              f"overlaps = {total}", file=sys.stderr, flush=True)
    jax.block_until_ready(state)

    steps = args.replicas * args.chunks * args.chunk_steps
    report = {
        "config": "dense(2886.5^2)" if args.dense else "reference",
        "replicas": args.replicas,
        "replica_steps": steps,
        "residual_overlap_steps": total,
        "rate": total / steps,
    }
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")


if __name__ == "__main__":
    main()
