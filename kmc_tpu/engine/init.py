"""Cold-start random placement (component C7 of SURVEY.md §2).

The reference inserts molecules sequentially with unbounded goto-retry
rejection sampling (main.cpp:281-351 receptors, 354-447 ligands).  The TPU
design keeps the sequential insertion order (it is a one-time O(n) setup)
but replaces the unbounded goto with a fixed fan-out: each insertion draws
``K_CANDIDATES`` positions at once and takes the first non-overlapping one.
At reference densities (~2% area fraction) the probability that all 64
candidates fail is < 1e-80, and the whole initializer stays jittable
(static shapes, lax.fori_loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kmc_tpu import rng
from kmc_tpu.config import SimConfig
from kmc_tpu.geometry import quat_from_euler
from kmc_tpu.state import SimState, empty_state

K_CANDIDATES = 64


def _insert_loop(key, n_insert, propose, accept, init_centers):
    """Generic sequential inserter.

    propose(subkey) -> [K, d] candidate centers;
    accept(cand [K, d], placed [n_insert, d], i) -> bool[K] validity mask.
    Returns centers [n_insert, d]."""

    def body(i, carry):
        centers, k = carry
        k, sub = jax.random.split(k)
        cand = propose(sub)                       # [K, d]
        ok = accept(cand, centers, i)             # [K]
        idx = jnp.argmax(ok)                      # first valid candidate
        centers = centers.at[i].set(cand[idx])
        return centers, k

    centers, _ = jax.lax.fori_loop(0, n_insert, body, (init_centers, key))
    return centers


def random_init(cfg: SimConfig, seed: int = 0) -> SimState:
    return random_init_from_key(cfg, rng.base_key(seed))


def random_init_from_key(cfg: SimConfig, base) -> SimState:
    """Cold start from an explicit (possibly traced) base key — the entry
    point for vmapped per-replica initialization."""
    key = rng.stream_key(rng.step_key(base, 0), rng.STREAM_INIT)
    ka, kb, kra, krb = jax.random.split(key, 4)

    lx, ly, lz = cfg.cell_range_x, cfg.cell_range_y, cfg.cell_range_z
    ra, rb = cfg.rb_a_radius, cfg.rb_b_radius

    # ---- receptors: xy plane, pairwise center distance > 2*R_A
    #      (main.cpp:283-296; the overlap check is 2D) ----
    def propose_a(k):
        u = jax.random.uniform(k, (K_CANDIDATES, 2))
        return u * jnp.array([lx, ly]) - jnp.array([lx / 2, ly / 2])

    def accept_a(cand, placed, i):
        d2 = jnp.sum((cand[:, None, :] - placed[None, :, :]) ** 2, -1)
        mask = jnp.arange(placed.shape[0]) < i
        bad = (d2 <= (2 * ra) ** 2) & mask[None, :]
        return ~jnp.any(bad, axis=1)

    # Far-away init so the j >= i mask is belt-and-braces.
    far = jnp.full((cfg.n_a, 2), 1e9, jnp.float32)
    a_centers = _insert_loop(ka, cfg.n_a, propose_a, accept_a, far)

    # ---- ligands: 3D box, avoid all A beads (3D distance, main.cpp:362-372)
    #      and previous B centers (main.cpp:375-383) ----
    a_bead_z = 2.0 * ra * jnp.arange(4, dtype=jnp.float32)
    a_beads = jnp.concatenate(
        [
            jnp.repeat(a_centers[:, None, :], 4, axis=1),
            jnp.broadcast_to(a_bead_z[None, :, None], (cfg.n_a, 4, 1)),
        ],
        axis=-1,
    ).reshape(-1, 3)                                        # [n_a*4, 3]

    cut_ab = ra + cfg.trimer_arm + rb                       # main.cpp:368
    cut_bb = 2.0 * cfg.trimer_arm + 2.0 * rb                # main.cpp:380

    def propose_b(k):
        u = jax.random.uniform(k, (K_CANDIDATES, 3))
        return u * jnp.array([lx, ly, lz]) - jnp.array([lx / 2, ly / 2, 0.0])
        # note: reference samples z in [0, Lz] (main.cpp:359) and x,y in
        # [-L/2, L/2]; the y half-shift uses cell_range_x in the reference
        # (main.cpp:358) — an inconsequential quirk for a square box.

    def accept_b(cand, placed, i):
        da2 = jnp.sum((cand[:, None, :] - a_beads[None, :, :]) ** 2, -1)
        bad_a = jnp.any(da2 <= cut_ab**2, axis=1)
        db2 = jnp.sum((cand[:, None, :] - placed[None, :, :]) ** 2, -1)
        mask = jnp.arange(placed.shape[0]) < i
        bad_b = jnp.any((db2 <= cut_bb**2) & mask[None, :], axis=1)
        return ~(bad_a | bad_b)

    far3 = jnp.full((cfg.n_b, 3), 1e9, jnp.float32)
    b_centers = _insert_loop(kb, cfg.n_b, propose_b, accept_b, far3)

    # ---- random orientations (main.cpp:328-330 receptors, 421-424 ligands) ----
    psai_a = (2.0 * jax.random.uniform(kra, (cfg.n_a,)) - 1.0) * jnp.pi
    eul_b = (2.0 * jax.random.uniform(krb, (3, cfg.n_b)) - 1.0) * jnp.pi

    st = empty_state(cfg, base)
    return st._replace(
        a_xy=a_centers.astype(jnp.float32),
        a_psi=psai_a.astype(jnp.float32),
        b_center=b_centers.astype(jnp.float32),
        b_quat=quat_from_euler(eul_b[0], eul_b[1], eul_b[2]),
    )
