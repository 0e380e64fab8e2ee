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
    of one lattice step each reference distance-1 neighbors (2 signed hop
    passes + merge + split), so one step needs width=4 — the ghost-zone
    sizing rule of SURVEY.md §5."""
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
    from kmc_tpu.lattice.grid import LatticeState
    from kmc_tpu.lattice.step import lattice_step

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    lh, lw = cfg.height // nx, cfg.width // ny

    def local_update(grid, disp, step, seed):
        # global origin of this shard's padded block: owned origin minus the
        # halo width; the counter hash + parity work on global coordinates,
        # so halo cells decide identically to their owners.
        row0 = jax.lax.axis_index("x") * lh - 4
        col0 = jax.lax.axis_index("y") * lw - 4
        padded = LatticeState(
            grid=halo_pad(grid, 4), disp=halo_pad(disp, 4), step=step,
            seed=seed, time=jnp.zeros((), jnp.float32),
        )
        out = lattice_step(padded, cfg, row0=row0, col0=col0)
        return out.grid[4:-4, 4:-4], out.disp[4:-4, 4:-4]

    shmapped = jax.shard_map(
        local_update,
        mesh=mesh,
        in_specs=(P("x", "y"), P("x", "y", None), P(), P()),
        out_specs=(P("x", "y"), P("x", "y", None)),
    )

    @jax.jit
    def step(state: LatticeState) -> LatticeState:
        grid, disp = shmapped(state.grid, state.disp, state.step, state.seed)
        return state._replace(grid=grid, disp=disp, step=state.step + 1,
                             time=state.time + 1.0)

    return step


def make_halo_pallas_step(cfg, mesh, interpret: bool | None = None):
    """shard_map + explicit halos + the fused Pallas kernel per device —
    the pod-scale composition (BASELINE config 5: each device owns a
    VMEM-sized block of a huge lattice; ppermute moves 4-cell ghost zones;
    one kernel invocation advances the block).  Bitwise-identical to every
    other lattice path (counter-hash randomness on global coordinates)."""
    import jax

    from kmc_tpu.lattice.grid import LatticeState
    from kmc_tpu.lattice.step import step_controls
    from kmc_tpu.ops.pallas_lattice import TILE, tiled_block_call

    nx, ny = mesh.shape["x"], mesh.shape["y"]
    lh, lw = cfg.height // nx, cfg.width // ny

    def local_update(grid, disp, step, seed, dir_idx, par_off):
        row0 = jax.lax.axis_index("x") * lh - 4
        col0 = jax.lax.axis_index("y") * lw - 4
        # prepadded tiling keeps each kernel invocation VMEM-sized even
        # when a device owns a large block (BASELINE config 5: 8192^2 over
        # a slice); ghosts come from the ppermute halo, not wrap
        g, d = tiled_block_call(
            cfg, halo_pad(grid, 4), halo_pad(disp, 4), step, seed,
            dir_idx, par_off, row0, col0,
            tile=(min(TILE, lh), min(TILE, lw)),
            interpret=interpret, prepadded=True,
        )
        return g, d

    shmapped = jax.shard_map(
        local_update,
        mesh=mesh,
        in_specs=(P("x", "y"), P("x", "y", None), P(), P(), P(), P()),
        out_specs=(P("x", "y"), P("x", "y", None)),
        check_vma=False,   # pallas_call outputs carry no vma annotation
    )

    @jax.jit
    def step(state: LatticeState) -> LatticeState:
        dir_idx, par_off = step_controls(state)
        grid, disp = shmapped(state.grid, state.disp, state.step, state.seed,
                              dir_idx, par_off)
        return state._replace(grid=grid, disp=disp, step=state.step + 1,
                             time=state.time + 1.0)

    return step
