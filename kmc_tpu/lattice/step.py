"""Lattice diffusion-reaction step.

Synchronous, conflict-free update via direction partitioning: each substep
draws ONE global direction d; every cell interacts only with its neighbor
in direction d, and a parity mask along d's axis guarantees each cell is in
at most one source-target pair.  All updates are therefore local pairwise
swaps expressible with jnp.roll — which XLA's SPMD partitioner lowers to
collective-permute halo exchanges automatically when the grid is sharded
over an ('x','y') mesh (the idiomatic TPU form of domain decomposition;
parallel/halo.py provides the explicit shard_map+ppermute variant of the
same step for the hand-scheduled path).

Per timestep:
  1. hop substep: occupied cell hops to an empty neighbor with probability
     hop_prob / k (oligomer size k — Stokes-like mass scaling); the
     displacement channel rides along.
  2. reaction substep: merge (a)+(b) -> (a+b) with ass_prob when a+b fits;
     split (k) -> (k-1)+(1) into an empty neighbor with diss_prob.

Because threefry is counter-based over the *global* array index, the drawn
uniforms are identical under any sharding — device boundaries cannot change
trajectories (tested in test_halo.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from kmc_tpu import rng as _rng
from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import MAX_SPECIES, LatticeState

# direction -> (dy, dx)
_DIRS = jnp.asarray([[0, 1], [1, 0], [0, -1], [-1, 0]], jnp.int32)


def _shift(x, dy, dx):
    """x shifted so entry [i,j] becomes the value at [i+dy, j+dx] (periodic)."""
    return jnp.roll(x, shift=(-dy, -dx), axis=(0, 1))


def _parity_mask(h, w, axis_is_y, offset):
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    coord = jnp.where(axis_is_y, ii, jj)
    return (coord % 2) == offset


def _hop_substep(grid, disp, u, d, parity):
    """Source cells (parity on) hop to the d-neighbor when it is empty."""
    dy, dx = d[0], d[1]
    nb = _shift(grid, dy, dx)
    k = jnp.maximum(grid, 1)
    move = (grid > 0) & (nb == 0) & parity & (u * k < 1.0)
    # u*k < hop_prob*? -- caller pre-scales u; see lattice_step
    moved_grid = jnp.where(move, 0, grid)
    incoming = _shift_back(jnp.where(move, grid, 0), dy, dx)
    new_grid = moved_grid + incoming

    dvec = jnp.stack([dy, dx]).astype(jnp.int32)
    moved_disp = jnp.where(move[..., None], 0, disp)
    inc_disp = _shift_back(jnp.where(move[..., None], disp + dvec, 0), dy, dx)
    new_disp = jnp.where(incoming[..., None] > 0, inc_disp, moved_disp)
    return new_grid, new_disp


def _shift_back(x, dy, dx):
    return jnp.roll(x, shift=(dy, dx), axis=(0, 1) if x.ndim == 2 else (0, 1))


def _react_substep(grid, disp, u_m, u_s, d, parity, cfg: LatticeConfig):
    dy, dx = d[0], d[1]
    nb = _shift(grid, dy, dx)

    # ---- merge: source (parity on) absorbs its d-neighbor ----
    merge = (
        (grid > 0) & (nb > 0) & (grid + nb <= MAX_SPECIES) & parity
        & (u_m < cfg.ass_prob)
    )
    absorbed = _shift_back(jnp.where(merge, 1, 0), dy, dx) > 0
    grid1 = jnp.where(merge, grid + nb, grid)
    grid1 = jnp.where(absorbed, 0, grid1)
    disp1 = jnp.where(absorbed[..., None], 0, disp)

    # ---- split: source (parity on, k>=2) ejects a monomer into an empty
    #      d-neighbor (mutually exclusive with merge: neighbor was occupied)
    nb1 = _shift(grid1, dy, dx)
    split = (grid1 >= 2) & (nb1 == 0) & parity & (u_s < cfg.diss_prob)
    receives = _shift_back(jnp.where(split, 1, 0), dy, dx) > 0
    grid2 = jnp.where(split, grid1 - 1, grid1) + jnp.where(receives, 1, 0)
    # ejected monomer starts with the parent's displacement
    parent_disp = _shift_back(disp1, dy, dx)
    disp2 = jnp.where(receives[..., None], parent_disp, disp1)
    return grid2, disp2


def lattice_step(state: LatticeState, cfg: LatticeConfig) -> LatticeState:
    h, w = cfg.height, cfg.width
    skey = _rng.stream_key(_rng.step_key(state.key, state.step),
                           _rng.STREAM_LATTICE)
    kd, ku, km, ks, kp = jax.random.split(skey, 5)

    dir_idx = jax.random.randint(kd, (2,), 0, 4)     # hop dir, react dir
    par_off = jax.random.randint(kp, (2,), 0, 2)
    d_hop = _DIRS[dir_idx[0]]
    d_rct = _DIRS[dir_idx[1]]
    par_hop = _parity_mask(h, w, dir_idx[0] % 2 == 1, par_off[0])
    par_rct = _parity_mask(h, w, dir_idx[1] % 2 == 1, par_off[1])

    # pre-scale: hop prob for species k is hop_prob / k  ->  u*k < hop_prob
    u = jax.random.uniform(ku, (h, w)) / jnp.float32(cfg.hop_prob)
    grid, disp = _hop_substep(state.grid, state.disp, u, d_hop, par_hop)

    u_m = jax.random.uniform(km, (h, w))
    u_s = jax.random.uniform(ks, (h, w))
    grid, disp = _react_substep(grid, disp, u_m, u_s, d_rct, par_rct, cfg)

    return state._replace(grid=grid, disp=disp, step=state.step + 1)


def make_lattice_step(cfg: LatticeConfig):
    return jax.jit(functools.partial(lattice_step, cfg=cfg))


def make_lattice_chunk(cfg: LatticeConfig, chunk: int):
    @jax.jit
    def f(state):
        def inner(st, _):
            return lattice_step(st, cfg), None

        state, _ = jax.lax.scan(inner, state, None, length=chunk)
        return state

    return f


def make_sharded_lattice_step(cfg: LatticeConfig, mesh,
                              chunk: Optional[int] = None):
    """Step with the grid sharded over an ('x','y') mesh.  jnp.roll on the
    sharded array compiles to halo collective-permutes on ICI."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh2 = NamedSharding(mesh, P("x", "y"))
    sh3 = NamedSharding(mesh, P("x", "y", None))

    def constrained(state):
        state = state._replace(
            grid=jax.lax.with_sharding_constraint(state.grid, sh2),
            disp=jax.lax.with_sharding_constraint(state.disp, sh3),
        )
        if chunk:
            def inner(st, _):
                return lattice_step(st, cfg), None

            state, _ = jax.lax.scan(inner, state, None, length=chunk)
        else:
            state = lattice_step(state, cfg)
        return state._replace(
            grid=jax.lax.with_sharding_constraint(state.grid, sh2),
            disp=jax.lax.with_sharding_constraint(state.disp, sh3),
        )

    return jax.jit(constrained)
