"""On-device connected components (component C8 of SURVEY.md §2).

The reference finds complexes with a queue-based BFS seeded from each ligand
(main.cpp:505-562).  Queues and data-dependent loops do not map to XLA; the
round-1-3 TPU design used min-label propagation with pointer jumping, but
its per-iteration index gathers (``label[label]``) lower to scalar-core
loops on TPU — measured ~15 ms/step at replica-batch 512, the single
largest cost in the whole engine (scripts/trace_step_tpu.py).

The round-4 design is fully dense: build the bond-graph adjacency matrix
A[i, j] (with self-loops) once per step, square it ``label_closure_iters``
times on the MXU (boolean transitive closure; k squarings cover components
of diameter 2^k — 2^8 = 256 > n guarantees exactness for ANY topology),
and read everything off the reachability matrix: label = min reachable
molecule index, size = row sum, #A/#B = partial row sums.  No gathers, no
segment reductions; bitwise-identical labels to the propagation form.

Outputs per molecule: component label (min molecule index in component),
component size, #A, #B — the inputs the diffusion engine needs (SURVEY §3.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.state import SimState, neighbors


class ClusterInfo(NamedTuple):
    label: jax.Array    # i32[n] component id = min molecule index in component
    size: jax.Array     # i32[n] component size, gathered per molecule
    n_a: jax.Array      # i32[n] receptors in component
    n_b: jax.Array      # i32[n] ligands in component
    is_root: jax.Array  # bool[n] molecule is its component's label


def reachability(state: SimState, cfg: SimConfig):
    """bool[n, n] transitive closure of the bond graph (incl. self-loops).

    Dense boolean matrix powering: A <- (A @ A > 0), squared
    ``label_closure_iters`` times; the matmuls run in bf16 on the MXU with
    f32 accumulation — entries are exact small counts, so the > 0 threshold
    is exact and the closure is bitwise-deterministic.
    """
    nbr = neighbors(state, cfg)                   # i32[n, 3], -1 padded
    n = cfg.n
    # exactness guard (ADVICE r4): k squarings cover components of diameter
    # 2^k; a config with n > 2^iters would silently mislabel large clusters
    assert 2 ** cfg.label_closure_iters >= n, (
        f"label_closure_iters={cfg.label_closure_iters} covers diameter "
        f"{2 ** cfg.label_closure_iters} < n={n}; raise it to "
        f">= ceil(log2(n))")
    idx = jnp.arange(n, dtype=jnp.int32)
    adj = jnp.any(nbr[:, :, None] == idx[None, None, :], axis=1)
    adj = adj | jnp.eye(n, dtype=bool)
    reach = adj.astype(jnp.bfloat16)
    for _ in range(cfg.label_closure_iters):      # coverage 2^iters >= n
        prod = jnp.matmul(reach, reach, preferred_element_type=jnp.float32)
        reach = (prod > 0.5).astype(jnp.bfloat16)
    return reach > 0.5


def cluster_labels(state: SimState, cfg: SimConfig) -> ClusterInfo:
    n = cfg.n
    idx = jnp.arange(n, dtype=jnp.int32)
    reach = reachability(state, cfg)
    label = jnp.min(jnp.where(reach, idx[None, :], n), axis=1).astype(
        jnp.int32
    )
    size = jnp.sum(reach, axis=1, dtype=jnp.int32)
    in_a = jnp.sum(reach[:, : cfg.n_a], axis=1, dtype=jnp.int32)
    return ClusterInfo(
        label=label,
        size=size,
        n_a=in_a,
        n_b=size - in_a,
        is_root=label == idx,
    )
