"""Lattice diffusion-reaction step.

Synchronous, conflict-free updates built from axis-aligned passes over
jnp.roll — which XLA's SPMD partitioner lowers to collective-permute halo
exchanges automatically when the grid is sharded over an ('x','y') mesh
(the idiomatic TPU form of domain decomposition; parallel/halo.py provides
the explicit shard_map+ppermute variant of the same step).

Per timestep:
  1. hop: a global axis is drawn per step, then every particle attempts a
     hop with probability hop_prob / k (oligomer size k — Stokes-like mass
     scaling) choosing its OWN +/- sign along the axis.  Two sub-passes
     (all + movers, then all - movers) keep targets unique without any
     parity mask; a per-particle sign is essential — a single global
     direction would move all active particles coherently, adding a
     collective drift mode that biases MSD estimates by O(hop_prob).
     The displacement channel rides along with each particle.
  2. reactions: one global direction d + a parity mask along d's axis
     (each cell in at most one source-target pair): merge (a)+(b) ->
     (a+b) with ass_prob when a+b fits; split (k) -> (k-1)+(1) into an
     empty d-neighbor with diss_prob.

One step references neighbors through 4 chained sub-passes, so explicit
halo exchange needs width-4 ghost zones (parallel/halo.py).

All randomness comes from the stateless per-cell counter hash
(ops/hashing.py) keyed by (global cell coordinates, step, seed, stream):
the drawn uniforms are identical under any sharding, in halo copies, and
inside Pallas kernels — device boundaries cannot change trajectories
(tested in test_halo.py, test_lattice.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import MAX_SPECIES, LatticeState
from kmc_tpu.ops.hashing import cell_uniform, scalar_uniforms

# stream salts: salt = seed * 16 + stream
SALT_CTRL = 0     # per-step direction/parity draws
SALT_HOP = 1
SALT_MERGE = 2
SALT_SPLIT = 3
SALT_SIGN = 4     # per-particle hop sign

# direction -> (dy, dx)
_DIRS = jnp.asarray([[0, 1], [1, 0], [0, -1], [-1, 0]], jnp.int32)


def _static_zero(s) -> bool:
    """True iff s is a compile-time zero shift.  Mosaic rejects the 0-width
    slice a zero-component roll decomposes into ("vector types must have
    positive constant sizes"), so the Pallas kernel variants (static
    directions, ops/pallas_lattice.py) must drop no-op axes; traced shifts
    (the XLA path) pass through untouched."""
    return isinstance(s, int) and s == 0


def _shift(x, dy, dx):
    """x shifted so entry [i,j] becomes the value at [i+dy, j+dx] (periodic)."""
    shifts, axes = [], []
    for s, ax in ((-dy, 0), (-dx, 1)):
        if not _static_zero(s):
            shifts.append(s)
            axes.append(ax)
    if not shifts:
        return x
    return jnp.roll(x, shift=tuple(shifts), axis=tuple(axes))


def _parity_mask(h, w, axis_is_y, offset):
    return _parity_mask_global(h, w, 0, 0, axis_is_y, offset)


def _parity_mask_global(h, w, row0, col0, axis_is_y, offset):
    """Parity of the *global* coordinate along the pairing axis — identical
    in halo copies across shard boundaries (grid dims must be even)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + jnp.asarray(
        row0, jnp.int32
    )
    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + jnp.asarray(
        col0, jnp.int32
    )
    coord = jnp.where(axis_is_y, ii, jj)
    return jnp.mod(coord, 2) == offset


def _bcast3(mask):
    """bool[H, W] -> bool[H, W, 1] via an int32 round trip: Mosaic only
    supports non-no-op minor-dim insertion for 32-bit types (i1 fails with
    "Insertion of minor dim that is not a no-op only supported for 32-bit
    types"); XLA fuses the cast away."""
    return mask.astype(jnp.int32)[..., None] > 0


def _hop_pass(grid, disp, moved, want, d):
    """One signed sub-pass: cells in ``want`` (attempting, sign matches,
    not already moved this step) hop to their d-neighbor if it is empty.
    For a fixed d every target has a unique source — conflict-free."""
    dy, dx = d[0], d[1]
    nb = _shift(grid, dy, dx)
    move = (grid > 0) & want & (~moved) & (nb == 0)
    moved_grid = jnp.where(move, 0, grid)
    incoming = _shift_back(jnp.where(move, grid, 0), dy, dx)
    new_grid = moved_grid + incoming

    dvec = jnp.stack([dy, dx]).astype(jnp.int32)
    moved_disp = jnp.where(_bcast3(move), 0, disp)
    inc_disp = _shift_back(jnp.where(_bcast3(move), disp + dvec, 0), dy, dx)
    new_disp = jnp.where(incoming[..., None] > 0, inc_disp, moved_disp)
    new_moved = (moved & ~move) | (incoming > 0)
    return new_grid, new_disp, new_moved


def _hop_substep(grid, disp, u_att, u_sgn, axis_idx):
    """Signed two-pass hop along the step's global axis: every particle
    attempts with its own probability and chooses its own +/- direction
    (u_sgn), eliminating the collective-drift mode a single global
    direction would induce."""
    attempt = (grid > 0) & (u_att * jnp.maximum(grid, 1) < 1.0)
    sgn_pos = u_sgn < 0.5
    dy = axis_idx.astype(jnp.int32)          # axis 0: (0,+-1); axis 1: (+-1,0)
    dx = 1 - dy
    d_pos = jnp.stack([dy, dx])
    d_neg = -d_pos
    moved = jnp.zeros_like(grid, bool)
    grid, disp, moved = _hop_pass(grid, disp, moved, attempt & sgn_pos, d_pos)
    grid, disp, moved = _hop_pass(grid, disp, moved, attempt & ~sgn_pos, d_neg)
    return grid, disp


def _shift_back(x, dy, dx):
    shifts, axes = [], []
    for s, ax in ((dy, 0), (dx, 1)):
        if not _static_zero(s):
            shifts.append(s)
            axes.append(ax)
    if not shifts:
        return x
    return jnp.roll(x, shift=tuple(shifts), axis=tuple(axes))


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
    disp1 = jnp.where(_bcast3(absorbed), 0, disp)

    # ---- split: source (parity on, k>=2) ejects a monomer into an empty
    #      d-neighbor (mutually exclusive with merge: neighbor was occupied)
    nb1 = _shift(grid1, dy, dx)
    split = (grid1 >= 2) & (nb1 == 0) & parity & (u_s < cfg.diss_prob)
    receives = _shift_back(jnp.where(split, 1, 0), dy, dx) > 0
    grid2 = jnp.where(split, grid1 - 1, grid1) + jnp.where(receives, 1, 0)
    # ejected monomer starts with the parent's displacement
    parent_disp = _shift_back(disp1, dy, dx)
    disp2 = jnp.where(_bcast3(receives), parent_disp, disp1)
    return grid2, disp2


def step_controls(state: LatticeState):
    """Per-step global draws: hop/react directions and parity offsets."""
    ctrl = scalar_uniforms(4, state.step, state.seed * 16 + SALT_CTRL)
    dir_idx = (ctrl[:2] * 4).astype(jnp.int32)
    par_off = (ctrl[2:] * 2).astype(jnp.int32)
    return dir_idx, par_off


def lattice_step(state: LatticeState, cfg: LatticeConfig,
                 row0=0, col0=0) -> LatticeState:
    """One step.  row0/col0 offset the cell-hash coordinates — 0 for a full
    grid; a shard's global origin when called on a local block (halo.py)."""
    h, w = state.grid.shape
    fh, fw = cfg.height, cfg.width
    dir_idx, par_off = step_controls(state)
    d_rct = _DIRS[dir_idx[1]]
    par_rct = _parity_mask_global(h, w, row0, col0, dir_idx[1] % 2 == 1,
                                  par_off[1])
    salt = state.seed * 16

    # pre-scale: hop prob for species k is hop_prob / k  ->  u*k < hop_prob
    u = cell_uniform((h, w), state.step, salt + SALT_HOP, row0, col0, fh, fw) \
        / jnp.float32(cfg.hop_prob)
    u_sgn = cell_uniform((h, w), state.step, salt + SALT_SIGN, row0, col0,
                         fh, fw)
    grid, disp = _hop_substep(state.grid, state.disp, u, u_sgn,
                              dir_idx[0] % 2)

    u_m = cell_uniform((h, w), state.step, salt + SALT_MERGE, row0, col0, fh, fw)
    u_s = cell_uniform((h, w), state.step, salt + SALT_SPLIT, row0, col0, fh, fw)
    grid, disp = _react_substep(grid, disp, u_m, u_s, d_rct, par_rct, cfg)

    return state._replace(grid=grid, disp=disp, step=state.step + 1,
                          time=state.time + 1.0)


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
