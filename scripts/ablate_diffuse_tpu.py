#!/usr/bin/env python
"""Sub-stage ablation of diffuse IN CONTEXT (round-3): where do the
~9 ms/step between 'labels' (2.0) and 'labels+diffuse' (11.2) actually go?

Variants build successively larger prefixes of diffuse's work, each
threading results into the carried state so XLA cannot DCE them:
  proposal   — mobility + draws + translate/rotate/wrap (no collisions)
  matrices   — + both molecule-level overlap matrices (reduced into state)
  project    — + label-space projection of the matrices
  full       — the real diffuse
Also times the profile-style and bench-style wrappers side by side to
explain the 0.009 ms vs 11.2 ms discrepancy between the two harnesses.
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
    print(json.dumps({"variant": name, "ms_per_step": round(ms, 4),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    from kmc_tpu import rng
    from kmc_tpu.config import SimConfig
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.diffusion import collide_matrix, diffuse, mobility
    from kmc_tpu.ops.segment import seg_max, seg_sum
    from kmc_tpu.state import positions
    from kmc_tpu.parallel.ensemble import init_ensemble

    print(f"# backend: {jax.default_backend()}  replicas={REPLICAS}",
          file=sys.stderr, flush=True)
    cfg = SimConfig()
    state = jax.block_until_ready(init_ensemble(cfg, REPLICAS, seed=0))

    v = jax.vmap

    def bump(st):
        return st._replace(step=st.step + 1)

    def proposal_core(s, info):
        """Everything in diffuse BEFORE collision resolution; returns the
        proposed state (copy of diffuse's proposal block)."""
        n, na = cfg.n, cfg.n_a
        dt = cfg.time_step
        lx, ly, lz = cfg.cell_range_x, cfg.cell_range_y, cfg.cell_range_z
        label = info.label
        skey = rng.stream_key(rng.step_key(s.key, s.step), rng.STREAM_MOVE)
        d, rot_d, free_b = mobility(info, cfg)
        u = jax.random.uniform(skey, (n, 7))
        amp = 2.0 * jnp.sqrt(d * dt / 6.0) * u[label, 0]
        phai = u[label, 1] * 2.0 * jnp.pi
        theta_dir = u[label, 2] * jnp.pi
        sin_t = jnp.where(free_b, jnp.sin(theta_dir), 1.0)
        cos_t = jnp.where(free_b, jnp.cos(theta_dir), 0.0)
        tvec = jnp.stack([amp * sin_t * jnp.cos(phai),
                          amp * sin_t * jnp.sin(phai), amp * cos_t], axis=-1)
        a_xy = s.a_xy + tvec[:na, :2]
        b_center = s.b_center + tvec[na:]
        return s._replace(a_xy=a_xy, b_center=b_center,
                          a_psi=s.a_psi + 1e-6 * u[label[:na], 3])

    def proposal(s):
        info = cluster_labels(s, cfg)
        return bump(proposal_core(s, info))

    def matrices(s):
        info = cluster_labels(s, cfg)
        prop = proposal_core(s, info)
        p = positions(prop, cfg)
        c = positions(s, cfg)
        hit_nn = collide_matrix(p, p, cfg)
        hit_no = collide_matrix(p, c, cfg)
        sig = (jnp.any(hit_nn, axis=1) | jnp.any(hit_no, axis=1))[: cfg.n_a]
        return bump(prop._replace(a_psi=prop.a_psi + 1e-9 * sig))

    def project(s):
        info = cluster_labels(s, cfg)
        prop = proposal_core(s, info)
        p = positions(prop, cfg)
        c = positions(s, cfg)
        hit_nn = collide_matrix(p, p, cfg)
        hit_no = collide_matrix(p, c, cfg)
        n = cfg.n
        ohf = (info.label[:, None] == jnp.arange(n)[None, :]).astype(
            jnp.float32)
        h_nn = (ohf.T @ hit_nn.astype(jnp.float32) @ ohf) > 0
        h_no = (ohf.T @ hit_no.astype(jnp.float32) @ ohf) > 0
        sig = (jnp.any(h_nn, axis=1) | jnp.any(h_no, axis=1))[: cfg.n_a]
        return bump(prop._replace(a_psi=prop.a_psi + 1e-9 * sig))

    def full(s):
        skey = rng.step_key(s.key, s.step)
        info = cluster_labels(s, cfg)
        s2 = diffuse(s, info, rng.stream_key(skey, rng.STREAM_MOVE), cfg)
        return bump(s2)

    time_variant("labels+proposal", v(proposal), state)
    time_variant("labels+matrices", v(matrices), state)
    time_variant("labels+project", v(project), state)
    time_variant("labels+diffuse_full", v(full), state)


if __name__ == "__main__":
    main()
