"""Multi-host SPMD runtime helpers (SURVEY.md §5 "distributed backend").

The reference is single-process with no communication layer; here the
"backend" is JAX's distributed coordination service + XLA collective
lowering onto ICI/DCN — nothing hand-written.  These helpers wrap the
standard multi-host recipe:

* one process per host, `jax.distributed.initialize` against a coordinator;
* global meshes spanning all hosts' devices;
* per-host replica blocks assembled into one global ensemble array with
  `jax.make_array_from_process_local_data`;
* ensemble observables merged with jnp means (psum under the hood).

Single-host fallbacks are exact no-ops, so every code path runs (and is
tested) on the 8-device virtual CPU platform.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime.  No-op when single-process (or when the
    standard env vars aren't set and no coordinator is given)."""
    if coordinator is None:
        coordinator = os.environ.get("KMC_COORDINATOR")
    if coordinator is None:
        return                                    # single-host
    if num_processes is None:
        num_processes = int(os.environ["KMC_NUM_PROCESSES"])
    if process_id is None:                        # NB: 0 is a valid id
        process_id = int(os.environ["KMC_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_replica_mesh() -> Mesh:
    """('dp',) mesh over every device of every host."""
    return Mesh(np.asarray(jax.devices()), ("dp",))


def host_local_ensemble(cfg, replicas_per_host: int, seed: int | None = None):
    """Build this host's replica block and assemble the global ensemble.

    Each process initializes only its own replicas (seeded by process index
    so streams are globally unique), then the blocks are stitched into one
    ('dp',)-sharded global array without any cross-host data movement.
    """
    from kmc_tpu.parallel.ensemble import init_ensemble

    pid = jax.process_index()
    nproc = jax.process_count()
    base_seed = (seed or 0) * nproc + pid
    local = init_ensemble(cfg, replicas_per_host, seed=base_seed)

    mesh = global_replica_mesh()
    sharding = NamedSharding(mesh, P("dp"))
    total = replicas_per_host * nproc

    def assemble(x):
        # PRNG-key leaves can't round-trip through numpy: assemble the
        # underlying uint32 key data, then reinterpret as keys
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = jax.random.key_data(x)
            glob = jax.make_array_from_process_local_data(
                sharding, np.asarray(data), (total,) + data.shape[1:]
            )
            return jax.random.wrap_key_data(glob)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), (total,) + x.shape[1:]
        )

    if nproc == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), local)
    return jax.tree.map(assemble, local)


def all_hosts_mean(x):
    """Mean of a replicated-per-host scalar/array across processes (uses a
    tiny psum under jit; identity when single-process)."""
    if jax.process_count() == 1:
        return x
    mesh = global_replica_mesh()

    def f(v):
        return jax.lax.pmean(v, "dp")

    return jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("dp"), out_specs=P())
    )(x)
