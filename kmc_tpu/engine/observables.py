"""On-device observables (component C20, C22-feed of SURVEY.md §2).

All four reference bond counters (main.cpp:135-136) are derived here as
pure functions of topology.  The reference maintains them incrementally
with reclassification corner cases (main.cpp:1931-1939, 2083-2088) whose
net invariant is exactly:

  bond_num_rl       = number of trans (receptor-ligand) bonds
  bond_num_mono_cis = cis bonds whose both receptors are trans-free
  bond_num_cis      = cis bonds with >=1 trans-bound receptor
  bond_num          = rl + mono_cis + cis

Cluster statistics follow main.cpp:976-977, 2200-2202: only ligand-seeded
clusters of size > 1 count, cluster_size = total member count / number of
such clusters.  ``max_complex`` is the running maximum over ligand-seeded
cluster sizes (main.cpp:896-898; never reset).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.clusters import ClusterInfo
from kmc_tpu.state import SimState


class Observables(NamedTuple):
    """One row of the reference ``bond.dat`` time series (main.cpp:2251)."""

    time_ns: jax.Array      # f32[] mc_time_step * time_step
    bond_rl: jax.Array      # i32[]
    bond_mono_cis: jax.Array
    bond_cis: jax.Array
    bond_num: jax.Array
    cluster_size: jax.Array  # f32[] mean ligand-seeded cluster size (>1 only)
    max_complex: jax.Array   # i32[] running max


def bond_counters(state: SimState, cfg: SimConfig):
    from kmc_tpu.ops import dense

    rl = jnp.sum(state.a_trans >= 0).astype(jnp.int32)
    has_cis = state.a_cis >= 0
    partner = jnp.clip(state.a_cis, 0, cfg.n_a - 1)
    trans_free = state.a_trans < 0
    # partner lookup via one-hot matmul (ops/dense.py: traced-index gathers
    # run on the TPU scalar core)
    tf_partner = dense.take(trans_free, dense.onehot(partner, cfg.n_a))
    mono_members = has_cis & trans_free & tf_partner
    mono = (jnp.sum(mono_members) // 2).astype(jnp.int32)
    total_cis = (jnp.sum(has_cis) // 2).astype(jnp.int32)
    cis = total_cis - mono
    return rl, mono, cis, rl + mono + cis


def cluster_stats(info: ClusterInfo, cfg: SimConfig):
    """(cluster_size, max_b_cluster) from ligand-seeded clusters."""
    seeded = info.is_root & (info.n_b > 0)
    big = seeded & (info.size > 1)
    tot = jnp.sum(jnp.where(big, info.size, 0))
    num = jnp.sum(big.astype(jnp.int32))
    cluster_size = jnp.where(num > 0, tot / jnp.maximum(num, 1), 0.0).astype(
        jnp.float32
    )
    max_b = jnp.max(jnp.where(seeded, info.size, 0)).astype(jnp.int32)
    return cluster_size, max_b


MAX_HIST_SIZE = 16


def cluster_histogram(info: ClusterInfo, cfg: SimConfig):
    """Histogram of ligand-seeded cluster sizes, i32[MAX_HIST_SIZE + 1]:
    slot s = number of clusters of size s (s >= MAX_HIST_SIZE binned into the
    last slot; slot 0 unused).  The cluster-size *distribution* is the
    headline correctness target (BASELINE.md): monomer/dimer/trimer/...
    fractions follow by normalization."""
    seeded = info.is_root & (info.n_b > 0)
    sizes = jnp.where(seeded, jnp.clip(info.size, 0, MAX_HIST_SIZE), 0)
    return jnp.bincount(sizes, length=MAX_HIST_SIZE + 1).at[0].set(0)


def seeded_receptor_histogram(info: ClusterInfo, cfg: SimConfig):
    """Histogram over the number of RECEPTORS in each ligand-seeded cluster,
    i32[MAX_HIST_SIZE + 1]: slot r = number of ligand-seeded clusters with r
    receptor members (r >= MAX_HIST_SIZE binned into the last slot; slot 0 =
    free ligands / pure-ligand clusters).  Directly comparable to the
    reference cluster.log (main.cpp:2291-2305): each nonempty row lists the
    member ids of one ligand-seeded BFS cluster, so its receptor count is
    the number of tokens <= protein_A_tot_num — the statistic the validator
    parses for the receptor monomer/dimer/trimer-fraction comparison."""
    seeded = info.is_root & (info.n_b > 0)
    idx = jnp.where(seeded, jnp.clip(info.n_a, 0, MAX_HIST_SIZE) + 1, 0)
    return jnp.bincount(idx, length=MAX_HIST_SIZE + 2)[1:]


def receptor_oligomer_histogram(info: ClusterInfo, cfg: SimConfig):
    """Histogram over the number of RECEPTORS per cluster (any cluster with
    >= 1 receptor, including free receptors as size 1) — the receptor
    oligomerization statistic of the underlying paper."""
    rooted = info.is_root & (info.n_a > 0)
    sizes = jnp.where(rooted, jnp.clip(info.n_a, 0, MAX_HIST_SIZE), 0)
    return jnp.bincount(sizes, length=MAX_HIST_SIZE + 1).at[0].set(0)


def observe(state: SimState, info: ClusterInfo, cfg: SimConfig) -> Observables:
    """Observables for the step just completed: counters from the committed
    topology, cluster stats from that step's start-of-step labels — the
    reference's exact bond.dat semantics (SURVEY §3.2)."""
    rl, mono, cis, total = bond_counters(state, cfg)
    cluster_size, _ = cluster_stats(info, cfg)
    return Observables(
        time_ns=(state.step.astype(jnp.float32) - 1.0) * cfg.time_step,
        bond_rl=rl,
        bond_mono_cis=mono,
        bond_cis=cis,
        bond_num=total,
        cluster_size=cluster_size,
        max_complex=state.max_complex,
    )
