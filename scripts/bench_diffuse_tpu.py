#!/usr/bin/env python
"""Decompose the diffuse-stage cost on TPU: symmetric rule vs sweep rule,
and sweep with the exact while_loop cleanup vs K unrolled cleanup rounds.

Each variant scans ITERS in-scan iterations over a vmapped ensemble (same
methodology as profile_step_tpu.py).  Run exclusively.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPLICAS = int(os.environ.get("PROF_REPLICAS", "256"))
ITERS = int(os.environ.get("PROF_ITERS", "30"))


def time_variant(name, body, state):
    @jax.jit
    def chunk(st):
        def inner(s, _):
            return body(s), None

        st, _ = jax.lax.scan(inner, st, None, length=ITERS)
        return st

    t0 = time.perf_counter()
    out = jax.block_until_ready(chunk(state))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jax.block_until_ready(chunk(out))
    ms = (time.perf_counter() - t0) / ITERS * 1000.0
    print(json.dumps({"variant": name, "ms_per_step": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    from kmc_tpu import rng
    from kmc_tpu.config import SimConfig
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.diffusion import diffuse
    from kmc_tpu.parallel.ensemble import init_ensemble

    print(f"# backend: {jax.default_backend()}  replicas={REPLICAS}",
          file=sys.stderr, flush=True)

    for name, kw in (
        ("diffuse_symmetric", dict(sweep_collisions=False)),
        ("diffuse_sweep_exact", dict(sweep_collisions=True)),
        ("diffuse_sweep_unrolled", dict(sweep_collisions=True,
                                        sweep_exact_cleanup=False)),
    ):
        try:
            cfg = SimConfig(**kw)
        except TypeError:          # knob not present in this build
            print(f"# skip {name} (unknown config field)", file=sys.stderr,
                  flush=True)
            continue
        state = jax.block_until_ready(init_ensemble(cfg, REPLICAS, seed=0))

        def body(s, cfg=cfg):
            skey = rng.step_key(s.key, s.step)
            info = cluster_labels(s, cfg)
            s2 = diffuse(s, info, rng.stream_key(skey, rng.STREAM_MOVE), cfg)
            return s2._replace(step=s.step + 1)

        time_variant(name, jax.vmap(body), state)


if __name__ == "__main__":
    main()
