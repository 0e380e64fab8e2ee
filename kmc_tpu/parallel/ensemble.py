"""Trajectory-ensemble parallelism (BASELINE config 4; SURVEY.md §7 stage 5).

The reference runs one trajectory per process.  On TPU the natural scaling
axis is replicas: ``vmap`` batches thousands of independent trajectories per
chip (independent Threefry streams via fold_in), and a ('dp',) mesh shards
the replica axis across chips/hosts.  Ensemble observables merge with jnp
means/histograms — under pjit XLA inserts the psum/all_gather collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from kmc_tpu import rng as _rng
from kmc_tpu.config import SimConfig
from kmc_tpu.engine.step import step_fn
from kmc_tpu.state import SimState


def init_ensemble(cfg: SimConfig, n_replicas: int, seed: int = 0) -> SimState:
    """Batched SimState: leading replica axis, independent placements and
    Threefry streams per replica (fold_in of the base seed)."""
    from kmc_tpu.engine.init import random_init_from_key

    def one(r):
        return random_init_from_key(cfg, _rng.replica_key(_rng.base_key(seed), r))

    return jax.jit(jax.vmap(one))(jnp.arange(n_replicas))


def broadcast_ensemble(state: SimState, n_replicas: int,
                       seed: int = 0) -> SimState:
    """One SimState -> a replica ensemble starting from that IDENTICAL
    configuration with independent Threefry streams per replica.

    The anchor-continuation form of init_ensemble: used to continue a
    reference checkpoint (io/checkpoint.load_reference_cpt) as an ensemble,
    so the oracle's own onward trajectory can be tested against the
    ensemble's predictive band from the same start (validation of the late
    horizon without re-simulating from t=0)."""
    keys = jax.vmap(
        lambda r: _rng.replica_key(_rng.base_key(seed), r)
    )(jnp.arange(n_replicas))
    bat = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_replicas, *x.shape)),
        state._replace(key=jnp.zeros((), jnp.int32)),   # key set below
    )
    return bat._replace(key=keys)


def make_ensemble_step(cfg: SimConfig, donate: bool = True):
    """Jitted vmapped step: batched SimState -> (SimState, batched Observables).

    Under a ('dp',)-sharded input the same function runs SPMD across chips;
    XLA partitions the batched ops with zero communication (trajectories are
    independent) — weak scaling is limited only by host dispatch.
    """
    f = jax.vmap(functools.partial(step_fn, cfg=cfg))
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def make_ensemble_chunk(cfg: SimConfig, chunk: Optional[int] = None,
                        donate: bool = True):
    """Jitted vmapped multi-step advance returning final-step observables."""
    chunk = chunk or cfg.out_every

    def chunk_one(state):
        def inner(st, _):
            return step_fn(st, cfg)

        state, obs = jax.lax.scan(inner, state, None, length=chunk)
        return state, jax.tree.map(lambda x: x[-1], obs)

    f = jax.vmap(chunk_one)
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def lazy_ensemble_step(state: SimState, cfg: SimConfig, k_align: int):
    """One ensemble step where the idealize stage runs only on the
    ``k_align`` most-dirty replicas (event-driven alignment).

    Idealize is a geometric no-op on clean replicas (align.py: a fully
    idealized cluster is a fixed point of the snap sweep), and replicas are
    dirty only in the step after a topology change or an align revert
    (state.dirty) — rare at steady state.  Gather the K dirtiest replicas,
    align just those, scatter back: the align stage's cost drops by R/K
    while every dirty replica is still aligned before its next reactions,
    the same one-step deferral the eager path already has (align runs
    before react inside a step, so a bond formed at step t is snapped at
    t+1 in BOTH paths).  If more than K replicas are dirty (only under
    event bursts, e.g. the first steps after a cold start) the overflow is
    aligned on subsequent steps, rotation-prioritized to prevent
    starvation."""
    from kmc_tpu import rng as _r
    from kmc_tpu.engine.align import idealize, idealize_fused
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.diffusion import diffuse
    from kmc_tpu.engine.observables import cluster_stats, observe
    from kmc_tpu.engine.reactions import react
    from kmc_tpu.engine.step import step_fn

    n_rep = state.step.shape[0]
    k_align = min(k_align, n_rep)

    def start(s):
        skey = _r.step_key(s.key, s.step)
        info = cluster_labels(s, cfg)
        _, max_b = cluster_stats(info, cfg)
        s2 = diffuse(s, info, _r.stream_key(skey, _r.STREAM_MOVE), cfg)
        return s2, info, jnp.maximum(s.max_complex, max_b)

    s1, info, max_c = jax.vmap(start)(state)

    # ---- gather the K dirtiest replicas (rotation tiebreak, no starvation)
    rot = (jnp.arange(n_rep) + state.step[0] * 7919) % n_rep
    order = jnp.argsort(jnp.where(s1.dirty, 0, n_rep * 2) + rot)
    idx = order[:k_align]
    sub = jax.tree.map(lambda x: x[idx], s1)

    def align_one(s):
        skey = _r.step_key(s.key, s.step)
        inf = cluster_labels(s, cfg)
        # fused core only on real TPU (interpret mode off-TPU is pure cost;
        # see engine/step.step_fn)
        use_fused = cfg.fused_align and jax.default_backend() == "tpu"
        f = idealize_fused if use_fused else idealize
        return f(s, inf, _r.stream_key(skey, _r.STREAM_ALIGN), cfg)

    sub2 = jax.vmap(align_one)(sub)

    def scatter(field):
        return getattr(s1, field).at[idx].set(getattr(sub2, field))

    s2 = s1._replace(
        a_xy=scatter("a_xy"), a_psi=scatter("a_psi"),
        b_center=scatter("b_center"), b_quat=scatter("b_quat"),
        b_laid=scatter("b_laid"), dirty=scatter("dirty"),
    )

    def finish(s, inf, mc):
        skey = _r.step_key(s.key, s.step)
        s3 = react(s, skey, cfg)
        s3 = s3._replace(step=s.step + 1, max_complex=mc)
        return s3, observe(s3, inf, cfg)

    return jax.vmap(finish)(s2, info, max_c)


def make_lazy_ensemble_chunk(cfg: SimConfig, chunk: Optional[int] = None,
                             k_align: Optional[int] = None,
                             donate: bool = True):
    """Jitted multi-step advance with event-driven (lazy) alignment.
    k_align defaults to max(replicas//8, 32)."""
    chunk = chunk or cfg.out_every

    def f(state):
        k = k_align or max(state.step.shape[0] // 8, 32)

        def inner(st, _):
            return lazy_ensemble_step(st, cfg, k)

        state, obs = jax.lax.scan(inner, state, None, length=chunk)
        return state, jax.tree.map(lambda x: x[-1], obs)

    return jax.jit(f, donate_argnums=(0,) if donate else ())


def make_lazy_ensemble_chunk_hist(cfg: SimConfig,
                                  chunk: Optional[int] = None,
                                  k_align: Optional[int] = None,
                                  donate: bool = True):
    """Lazy-alignment chunk that also returns the final-step per-replica
    cluster-size histogram AND the receptor-count-per-seeded-cluster
    histogram — lets the statistical validator
    (scripts/validate_vs_reference.py) run in the SAME event-driven mode
    bench.py ships as default, so the lazy approximation is validated
    against the reference at the scale it is used (VERDICT r2 #5)."""
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.observables import (
        cluster_histogram, seeded_receptor_histogram)

    chunk = chunk or cfg.out_every

    def f(state):
        k = k_align or max(state.step.shape[0] // 8, 32)

        def inner(st, _):
            return lazy_ensemble_step(st, cfg, k)

        state, obs = jax.lax.scan(inner, state, None, length=chunk)

        def hist_one(s):
            info = cluster_labels(s, cfg)
            return (cluster_histogram(info, cfg),
                    seeded_receptor_histogram(info, cfg))

        hist, ahist = jax.vmap(hist_one)(state)
        return state, (jax.tree.map(lambda x: x[-1], obs), hist, ahist)

    return jax.jit(f, donate_argnums=(0,) if donate else ())


def make_ensemble_chunk_hist(cfg: SimConfig, chunk: Optional[int] = None,
                             donate: bool = True):
    """Jitted vmapped multi-step advance returning (state, (obs, hist,
    ahist)) where ``hist`` is the per-replica ligand-seeded cluster-size
    histogram and ``ahist`` the receptor-count-per-seeded-cluster histogram
    (engine.observables) at the final step — the on-device form of the
    reference's cluster.log frames (main.cpp:2291-2305), used by the
    statistical validator (scripts/validate_vs_reference.py clusters)."""
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.observables import (
        cluster_histogram, seeded_receptor_histogram)

    chunk = chunk or cfg.out_every

    def chunk_one(state):
        def inner(st, _):
            return step_fn(st, cfg)

        state, obs = jax.lax.scan(inner, state, None, length=chunk)
        info = cluster_labels(state, cfg)
        hist = cluster_histogram(info, cfg)
        ahist = seeded_receptor_histogram(info, cfg)
        return state, (jax.tree.map(lambda x: x[-1], obs), hist, ahist)

    f = jax.vmap(chunk_one)
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def merge_observables(obs):
    """Ensemble mean of each observable (psum-backed under sharding)."""
    return jax.tree.map(lambda x: jnp.mean(x.astype(jnp.float32), axis=0), obs)
