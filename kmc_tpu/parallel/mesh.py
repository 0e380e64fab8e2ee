"""Device-mesh helpers (SURVEY.md §2 parallelism table).

The reference has no parallelism of any kind (single thread, main.cpp).
Every strategy here is a new-build: data parallelism is trajectory-ensemble
sharding over a ('dp',) axis; the spatial analogue of sequence parallelism
is ('x','y') domain decomposition for the lattice engine (parallel/halo.py).
Collectives are compiled by XLA onto ICI; there is no hand-written
transport layer.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replica_mesh(devices=None) -> Mesh:
    """1-D ('dp',) mesh over all (or given) devices for replica ensembles."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("dp",))


def grid_mesh(shape, devices=None) -> Mesh:
    """2-D ('x','y') mesh for domain-decomposed lattices."""
    devices = devices if devices is not None else jax.devices()
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("x", "y"))


def replica_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (replica) axis of every state leaf over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def shard_replicated_state(state, mesh: Mesh):
    """Place an ensemble state (leading replica axis) onto a ('dp',) mesh."""
    sh = replica_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, state)
