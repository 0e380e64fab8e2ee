"""Lattice state (BASELINE configs 2/5).

A 2D periodic occupancy grid: cell value k = oligomer of size k (0 empty).
The oligomer size is the species — so the "cluster-size distribution"
observable is a plain histogram of the grid, the moral equivalent of the
particle engine's connected-component sizes.

``disp`` carries each particle's accumulated displacement (for MSD
validation against the reference's free-diffusion statistics, SURVEY.md §7
stage 2); it rides along with hops and is absorbed on merges.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmc_tpu import rng as _rng
from kmc_tpu.config import LatticeConfig

MAX_SPECIES = 8   # largest oligomer; association above this is gated off


class LatticeState(NamedTuple):
    grid: jax.Array   # int32[H, W] oligomer size per cell (0 = empty)
    disp: jax.Array   # int32[H, W, 2] accumulated (dy, dx) of the occupant
    step: jax.Array   # i32[] steps (fixed-dt) / events applied (rejection-free)
    seed: jax.Array   # i32[] stream seed for the per-cell counter hash
    time: jax.Array   # f32[] simulated time in step units: fixed-dt advances
    #   by 1 per step; rejection-free by Exp(1)/total_rate per event
    #   (lattice/rejection_free.py) — the shared axis the two modes meet on


def init_lattice(cfg: LatticeConfig, seed: int = 0,
                 n_particles: int | None = None) -> LatticeState:
    """Random monomer fill at cfg.density (or exactly n_particles)."""
    key = _rng.base_key(seed)
    kfill = _rng.stream_key(_rng.step_key(key, 0), _rng.STREAM_LATTICE)
    h, w = cfg.height, cfg.width
    if n_particles is None:
        occupied = jax.random.uniform(kfill, (h, w)) < cfg.density
    else:
        flat = jnp.zeros((h * w,), bool).at[:n_particles].set(True)
        occupied = jax.random.permutation(kfill, flat).reshape(h, w)
    grid = occupied.astype(jnp.int32)
    return LatticeState(
        grid=grid,
        disp=jnp.zeros((h, w, 2), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        seed=jnp.asarray(seed, jnp.int32),
        time=jnp.zeros((), jnp.float32),
    )


def species_histogram(state: LatticeState) -> jax.Array:
    """Count of cells per species 0..MAX_SPECIES (0 = empty cells)."""
    return jnp.bincount(state.grid.reshape(-1), length=MAX_SPECIES + 1)


def particle_count(state: LatticeState) -> jax.Array:
    """Total monomer-equivalents (conserved by hop/merge/split)."""
    return jnp.sum(state.grid)


def msd(state: LatticeState) -> jax.Array:
    """Mean squared displacement over occupied cells (lattice units^2)."""
    occ = state.grid > 0
    d2 = jnp.sum(state.disp.astype(jnp.float32) ** 2, axis=-1)
    return jnp.sum(jnp.where(occ, d2, 0.0)) / jnp.maximum(jnp.sum(occ), 1)
