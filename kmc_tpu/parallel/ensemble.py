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


def make_ensemble_chunk_hist(cfg: SimConfig, chunk: Optional[int] = None,
                             donate: bool = True):
    """Jitted vmapped multi-step advance returning (state, (obs, hist)) where
    ``hist`` is the per-replica ligand-seeded cluster-size histogram
    (engine.observables.cluster_histogram) at the final step — the on-device
    form of the reference's cluster.log frames (main.cpp:2291-2305), used by
    the statistical validator (scripts/validate_vs_reference.py clusters)."""
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.observables import cluster_histogram

    chunk = chunk or cfg.out_every

    def chunk_one(state):
        def inner(st, _):
            return step_fn(st, cfg)

        state, obs = jax.lax.scan(inner, state, None, length=chunk)
        info = cluster_labels(state, cfg)
        hist = cluster_histogram(info, cfg)
        return state, (jax.tree.map(lambda x: x[-1], obs), hist)

    f = jax.vmap(chunk_one)
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def merge_observables(obs):
    """Ensemble mean of each observable (psum-backed under sharding)."""
    return jax.tree.map(lambda x: jnp.mean(x.astype(jnp.float32), axis=0), obs)
