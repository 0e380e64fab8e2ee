"""Counter-based RNG streams (component C3 of SURVEY.md §2).

The reference's ``rand2()`` re-seeds a fresh mt19937_64 from the nanosecond
clock on EVERY call (main.cpp:2313-2326) — irreproducible by construction.
Here every random draw comes from a Threefry key derived deterministically
from ``(base_seed, step, stream)`` so runs are bitwise reproducible, replicas
are independent, and checkpoint/resume restores the exact stream position.
"""

from __future__ import annotations

import jax

# Stable stream identifiers.  Adding new streams is append-only; reordering
# would silently change trajectories of fixed seeds.
STREAM_INIT = 0
STREAM_MOVE = 1
STREAM_REACT_TRANS = 2
STREAM_REACT_MONO_CIS = 3
STREAM_REACT_CIS = 4
STREAM_DISS_TRANS = 5
STREAM_DISS_MONO_CIS = 6
STREAM_DISS_CIS = 7
STREAM_ALIGN = 8
STREAM_LATTICE = 9


def base_key(seed: int):
    return jax.random.key(seed)


def replica_key(key, replica: int):
    """Independent per-replica stream (ensemble data parallelism)."""
    return jax.random.fold_in(key, replica)


def step_key(key, step):
    """Per-timestep subkey; ``step`` may be a traced int32."""
    return jax.random.fold_in(key, step)


def stream_key(skey, stream: int):
    """Per-(step, subsystem) subkey."""
    return jax.random.fold_in(skey, stream)
