"""Explicit halo exchange for domain-decomposed lattices (SURVEY.md §5
"long-context / sequence parallelism" analogue).

Two implementations of the same decomposition:

1.  The *implicit* path (lattice/step.py `make_sharded_lattice_step`):
    jnp.roll on a NamedSharding('x','y') array — XLA's SPMD partitioner
    inserts the halo collective-permutes itself.  Preferred: zero manual
    communication code, identical numerics.
2.  The *explicit* path here: shard_map over the mesh, with jax.lax.ppermute
    ring shifts pulling 1-cell-wide edge strips from the four neighbors
    into a padded local block — the hand-scheduled form (the moral
    equivalent of ring attention's neighbor passing), useful as a
    performance baseline and as the substrate for per-shard Pallas kernels
    that need their halos materialized.

Both paths are verified bitwise-identical in tests/test_halo.py (threefry
randomness is counter-based over global indices, so decomposition cannot
change trajectories).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _ring_pull(x, axis_name, direction):
    """Value of x on the neighbor `direction` steps along axis_name."""
    n = jax.lax.axis_size(axis_name)
    perm = [((i + direction) % n, i) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


def halo_pad(local, width=1, axis_x="x", axis_y="y"):
    """Pad a local [h, w(, c)] block with ``width``-cell periodic halos
    pulled from the 4 mesh neighbors (corners are not needed by the
    axis-aligned update rule of lattice/step.py).  The two chained substeps
    of one lattice step each reference distance-1 neighbors, so one step
    needs width=2 — the ghost-zone sizing rule of SURVEY.md §5."""
    top = _ring_pull(local[-width:], axis_x, -1)  # neighbor above's last rows
    bot = _ring_pull(local[:width], axis_x, 1)
    body = jnp.concatenate([top, local, bot], axis=0)
    left = _ring_pull(body[:, -width:], axis_y, -1)
    right = _ring_pull(body[:, :width], axis_y, 1)
    return jnp.concatenate([left, body, right], axis=1)


def make_halo_lattice_step(cfg, mesh):
    """shard_map lattice step: per-device local blocks + explicit halos.

    The update rule of lattice/step.py only references the d-neighbor, so a
    1-cell halo suffices; after the local update the halo is cropped and
    the owned block written back.  Globally-consistent randomness comes
    from generating the uniform fields *outside* shard_map (sharded by
    XLA, counter-based => identical to the single-device values).
    """
    from kmc_tpu import rng as _rng
    from kmc_tpu.lattice.grid import LatticeState
    from kmc_tpu.lattice.step import (
        _DIRS,
        _hop_substep,
        _parity_mask,
        _react_substep,
    )

    h, w = cfg.height, cfg.width

    def local_update(grid, disp, u, u_m, u_s, par_hop, par_rct, d_hop, d_rct):
        gp = halo_pad(grid, 2)
        dp = halo_pad(disp, 2)
        up = halo_pad(u, 2)
        ump = halo_pad(u_m, 2)
        usp = halo_pad(u_s, 2)
        php = halo_pad(par_hop, 2)
        prp = halo_pad(par_rct, 2)
        g1, d1 = _hop_substep(gp, dp, up, d_hop, php)
        g2, d2 = _react_substep(g1, d1, ump, usp, d_rct, prp, cfg)
        return g2[2:-2, 2:-2], d2[2:-2, 2:-2]

    shmapped = jax.shard_map(
        local_update,
        mesh=mesh,
        in_specs=(
            P("x", "y"), P("x", "y", None), P("x", "y"), P("x", "y"),
            P("x", "y"), P("x", "y"), P("x", "y"), P(), P(),
        ),
        out_specs=(P("x", "y"), P("x", "y", None)),
    )

    @jax.jit
    def step(state: LatticeState) -> LatticeState:
        skey = _rng.stream_key(_rng.step_key(state.key, state.step),
                               _rng.STREAM_LATTICE)
        kd, ku, km, ks, kp = jax.random.split(skey, 5)
        dir_idx = jax.random.randint(kd, (2,), 0, 4)
        par_off = jax.random.randint(kp, (2,), 0, 2)
        d_hop = _DIRS[dir_idx[0]]
        d_rct = _DIRS[dir_idx[1]]
        par_hop = _parity_mask(h, w, dir_idx[0] % 2 == 1, par_off[0])
        par_rct = _parity_mask(h, w, dir_idx[1] % 2 == 1, par_off[1])
        u = jax.random.uniform(ku, (h, w)) / jnp.float32(cfg.hop_prob)
        u_m = jax.random.uniform(km, (h, w))
        u_s = jax.random.uniform(ks, (h, w))
        grid, disp = shmapped(state.grid, state.disp, u, u_m, u_s,
                              par_hop, par_rct, d_hop, d_rct)
        return state._replace(grid=grid, disp=disp, step=state.step + 1)

    return step
