"""Simulation state pytree (component C2 of SURVEY.md §2).

The reference stores state in 12 global AoS coordinate arrays plus topology
matrices (main.cpp:101-168), double-buffered by hand each step
(main.cpp:464-498, 2164-2198), and accumulates rigid transforms directly in
those coordinates.  The TPU design stores **poses** instead: a receptor is
(x, y, azimuth) — its z structure is fixed by construction (main.cpp:298-315)
— and a ligand is (center, unit quaternion).  Bead/site coordinates are
derived from canonical templates every step (``positions``), so rigid bodies
are exactly rigid forever (no accumulated float drift), state is 9 floats
per ligand and 3 per receptor instead of 48 coordinates, and "double
buffering" is just the functional update step : SimState -> SimState.
A leading replica axis under ``vmap`` gives trajectory-ensemble parallelism.

Index conventions (0-based throughout):

* Molecules 0..n_a-1 are receptors (A), n_a..n-1 are ligands (B).
* Derived ``pos``: float32[n, 4, 4, 3] = [molecule, bead, point, xyz].
  - A beads 0..3 are the rod (bead centers z = 0, 2R, 4R, 6R); points:
    0 = center, 1 = +x site, 2 = -x site, 3 = +z marker
    (reference R_*[i][j][k] with j,k 1-based; main.cpp:298-315).
    Interaction bead is bead 2: trans site = (2,1), cis site = (2,2),
    orientation marker = (2,3)  (reference [i][3][2..4]).
  - B bead 0 is the virtual center (point 0 = center, point 1 = up-site);
    beads 1..3 are the trimer (point 0 = bead center, point 1 = outward
    binding site)  (main.cpp:386-412).  Unused point slots hold zeros.
* Topology (reference protein_status / res_nei, main.cpp:115-118):
  - ``a_trans``: int32[n_a], bound B molecule index or -1
  - ``a_site``:  int32[n_a], bound B bead (1..3) or -1
  - ``a_cis``:   int32[n_a], cis partner A index or -1
  - ``b_partner``: int32[n_b, 3], A bound at bead (1+k)'s site, or -1
  - ``b_laid``: bool[n_b], ligand lies in the membrane plane (the reference
    encodes this in exact float geometry, main.cpp:1140-1141)

All reference bond counters (bond_num, bond_num_rl, bond_num_cis,
bond_num_mono_cis; main.cpp:135-136) are pure functions of this topology —
see engine/observables.py — so they are not carried as state.  The one
genuinely stateful observable, the running maximum complex size
(main.cpp:896-898), is ``max_complex``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.geometry import quat_identity, quat_rotate
from kmc_tpu.models.tnfr import ligand_template, receptor_template


class SimState(NamedTuple):
    a_xy: jax.Array         # f32[n_a, 2] rod axis position
    a_psi: jax.Array        # f32[n_a]    rod azimuth (rotation about z)
    b_center: jax.Array     # f32[n_b, 3] trimer virtual center
    b_quat: jax.Array       # f32[n_b, 4] orientation (w, x, y, z)
    a_trans: jax.Array      # i32[n_a]
    a_site: jax.Array       # i32[n_a]
    a_cis: jax.Array        # i32[n_a]
    b_partner: jax.Array    # i32[n_b, 3]
    b_laid: jax.Array       # bool[n_b]
    max_complex: jax.Array  # i32[] running max B-seeded cluster size
    step: jax.Array         # i32[] current MC step (1-based like the reference)
    key: jax.Array          # PRNG base key (typed key array)
    dirty: jax.Array        # bool[] geometry may be un-idealized: set by
    #   react on topology change and by align on collision revert, cleared
    #   by a revert-free idealize.  Lets the ensemble driver run the align
    #   stage only on replicas that need it (parallel/ensemble.py lazy path);
    #   a clean replica's idealize is a geometric no-op (align.py docstring).


def empty_state(cfg: SimConfig, key) -> SimState:
    return SimState(
        a_xy=jnp.zeros((cfg.n_a, 2), jnp.float32),
        a_psi=jnp.zeros((cfg.n_a,), jnp.float32),
        b_center=jnp.zeros((cfg.n_b, 3), jnp.float32),
        b_quat=quat_identity((cfg.n_b,)),
        a_trans=jnp.full((cfg.n_a,), -1, jnp.int32),
        a_site=jnp.full((cfg.n_a,), -1, jnp.int32),
        a_cis=jnp.full((cfg.n_a,), -1, jnp.int32),
        b_partner=jnp.full((cfg.n_b, 3), -1, jnp.int32),
        b_laid=jnp.zeros((cfg.n_b,), bool),
        max_complex=jnp.zeros((), jnp.int32),
        step=jnp.ones((), jnp.int32),
        key=key,
        dirty=jnp.ones((), bool),
    )


def init_state(cfg: SimConfig, seed: int = 0) -> SimState:
    """Cold start: random non-overlapping placement (component C7)."""
    from kmc_tpu.engine.init import random_init

    return random_init(cfg, seed)


# ---------------------------------------------------------------------------
# Derived coordinates.

def a_positions(a_xy, a_psi, cfg: SimConfig):
    """Receptor bead/point coordinates, f32[n_a, 4, 4, 3]."""
    tmpl = receptor_template(cfg).reshape(16, 3)
    c, s = jnp.cos(a_psi), jnp.sin(a_psi)
    x, y = tmpl[:, 0], tmpl[:, 1]
    rx = x[None, :] * c[:, None] - y[None, :] * s[:, None] + a_xy[:, 0:1]
    ry = x[None, :] * s[:, None] + y[None, :] * c[:, None] + a_xy[:, 1:2]
    rz = jnp.broadcast_to(tmpl[None, :, 2], rx.shape)
    return jnp.stack([rx, ry, rz], axis=-1).reshape(-1, 4, 4, 3)


def b_positions(b_center, b_quat, cfg: SimConfig):
    """Ligand bead/point coordinates, f32[n_b, 4, 4, 3]."""
    tmpl = ligand_template(cfg).reshape(16, 3)
    pts = quat_rotate(b_quat[:, None, :], tmpl[None, :, :]) + b_center[:, None, :]
    return pts.reshape(-1, 4, 4, 3)


def positions(state: SimState, cfg: SimConfig):
    """All coordinates, f32[n, 4, 4, 3] (A block then B block)."""
    return jnp.concatenate(
        [
            a_positions(state.a_xy, state.a_psi, cfg),
            b_positions(state.b_center, state.b_quat, cfg),
        ],
        axis=0,
    )


def neighbors(state: SimState, cfg: SimConfig):
    """Bond-graph neighbor lists, int32[n, 3], -1 padded.

    For A: column 0 = trans partner, column 1 = cis partner.  For B all
    three columns are its per-bead site partners.  Mirrors the BFS adjacency
    of the reference (main.cpp:543-551).
    """
    nbr = jnp.full((cfg.n, 3), -1, jnp.int32)
    nbr = nbr.at[: cfg.n_a, 0].set(state.a_trans)
    nbr = nbr.at[: cfg.n_a, 1].set(state.a_cis)
    nbr = nbr.at[cfg.n_a:, :].set(state.b_partner)
    return nbr
