"""On-device connected components (component C8 of SURVEY.md §2).

The reference finds complexes with a queue-based BFS seeded from each ligand
(main.cpp:505-562).  Queues and data-dependent loops do not map to XLA; the
TPU equivalent is min-label propagation with pointer jumping: every molecule
starts labeled with its own index, repeatedly takes the min label over its
bond-graph neighbors, then jumps ``label <- label[label]``.  Because labels
are molecule indices, pointer jumping halves the distance to the component
root each round, so ``label_prop_iters = 8`` rounds resolve any component of
diameter up to 2^8 (far beyond physical complex sizes, which the mobility
gate at main.cpp:984-985 keeps small).

Outputs per molecule: component label (min molecule index in component),
component size, #A, #B — the inputs the diffusion engine needs (SURVEY §3.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.ops.segment import seg_sum
from kmc_tpu.state import SimState, neighbors


class ClusterInfo(NamedTuple):
    label: jax.Array    # i32[n] component id = min molecule index in component
    size: jax.Array     # i32[n] component size, gathered per molecule
    n_a: jax.Array      # i32[n] receptors in component
    n_b: jax.Array      # i32[n] ligands in component
    is_root: jax.Array  # bool[n] molecule is its component's label


def cluster_labels(state: SimState, cfg: SimConfig) -> ClusterInfo:
    nbr = neighbors(state, cfg)                   # i32[n, 3], -1 padded
    n = cfg.n
    idx = jnp.arange(n, dtype=jnp.int32)

    label = idx
    clipped = jnp.clip(nbr, 0)
    pad = nbr < 0
    for _ in range(cfg.label_prop_iters):       # unrolled: tiny bodies fuse
        # neighbor-min: gather labels of up to 3 neighbors (self for -1 pads)
        nls = jnp.where(pad, label[:, None], label[clipped])
        label = jnp.minimum(label, jnp.min(nls, axis=1))
        # pointer jumping: label <- label[label]
        label = jnp.minimum(label, label[label])

    ones = jnp.ones((n,), jnp.int32)
    size_per_label = seg_sum(ones, label, n)
    a_per_label = seg_sum((idx < cfg.n_a).astype(jnp.int32), label, n)
    b_per_label = seg_sum((idx >= cfg.n_a).astype(jnp.int32), label, n)
    return ClusterInfo(
        label=label,
        size=size_per_label[label],
        n_a=a_per_label[label],
        n_b=b_per_label[label],
        is_root=label == idx,
    )
