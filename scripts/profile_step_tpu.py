#!/usr/bin/env python
"""Per-component hardware timing of the particle-engine step (VERDICT r1
item 8: explain the residual idealize cost).

Each variant wraps N scan iterations of a partial step over a 256-replica
vmapped ensemble, so per-step numbers are in-scan (no dispatch overhead).
Components are ablated cumulatively AND measured in isolation inside a
scan that still threads the full state (so XLA cannot dead-code them).

Run exclusively (one TPU process at a time).
"""

import functools
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
    """body: state -> state; scanned ITERS times, timed over 2 runs."""

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
    from kmc_tpu.engine.align import (
        _choose_roots,
        _collision_revert,
        idealize_fused,
    )
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.diffusion import diffuse
    from kmc_tpu.engine.observables import cluster_stats, observe
    from kmc_tpu.engine.reactions import react
    from kmc_tpu.engine.step import step_fn
    from kmc_tpu.ops.pallas_align import align_core
    from kmc_tpu.parallel.ensemble import init_ensemble

    print(f"# backend: {jax.default_backend()}  replicas={REPLICAS}",
          file=sys.stderr, flush=True)
    cfg = SimConfig()                     # fused_align=True default

    state = jax.block_until_ready(init_ensemble(cfg, REPLICAS, seed=0))

    def v(f):
        return jax.vmap(f)

    def bump(st):
        return st._replace(step=st.step + 1)

    # --- full step (reference point) ---
    time_variant("full_step", v(lambda s: step_fn(s, cfg)[0]), state)

    # --- labels only ---
    def labels_only(s):
        info = cluster_labels(s, cfg)
        return bump(s._replace(a_psi=s.a_psi + 1e-12 * info.size[: cfg.n_a]))

    time_variant("labels", v(labels_only), state)

    # --- labels + diffuse ---
    def diff_only(s):
        skey = rng.step_key(s.key, s.step)
        info = cluster_labels(s, cfg)
        s2 = diffuse(s, info, rng.stream_key(skey, rng.STREAM_MOVE), cfg)
        return bump(s2)

    time_variant("labels+diffuse", v(diff_only), state)

    # --- labels + align (fused) ---
    def align_only(s):
        skey = rng.step_key(s.key, s.step)
        info = cluster_labels(s, cfg)
        s2 = idealize_fused(s, info, rng.stream_key(skey, rng.STREAM_ALIGN),
                            cfg)
        return bump(s2)

    time_variant("labels+align_fused", v(align_only), state)

    # --- align internals: kernel alone / roots alone / revert alone ---
    def align_kernel_only(s):
        skey = rng.step_key(s.key, s.step)
        info = cluster_labels(s, cfg)
        is_root = _choose_roots(s, info, rng.stream_key(skey,
                                                        rng.STREAM_ALIGN), cfg)
        act = info.size > 1
        a_xy, a_psi, b_center, b_quat, b_laid, _unr = align_core(
            s, is_root, act, cfg
        )
        return bump(s._replace(a_xy=a_xy, a_psi=a_psi, b_center=b_center,
                               b_quat=b_quat, b_laid=b_laid))

    time_variant("labels+roots+align_kernel", v(align_kernel_only), state)

    def revert_only(s):
        info = cluster_labels(s, cfg)
        prop = s._replace(a_xy=s.a_xy + 1e-6)
        s2 = _collision_revert(s, prop, info, cfg)
        return bump(s2)

    time_variant("labels+collision_revert", v(revert_only), state)

    # --- labels + react ---
    def react_only(s):
        skey = rng.step_key(s.key, s.step)
        _ = cluster_labels(s, cfg)
        s2 = react(s, skey, cfg)
        return bump(s2)

    time_variant("labels+react", v(react_only), state)

    # --- observables ---
    def obs_only(s):
        info = cluster_labels(s, cfg)
        o = observe(s, info, cfg)
        return bump(s._replace(a_psi=s.a_psi + 1e-12 * o.cluster_size))

    time_variant("labels+observe", v(obs_only), state)


if __name__ == "__main__":
    main()
