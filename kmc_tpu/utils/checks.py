"""Debug-mode invariant checks (SURVEY.md §5 "race detection" analogue).

The reference is single-threaded and has no assertions; its only self-check
is the AreSame-triggered re-alignment (main.cpp:782, 1215, ...).  The TPU
engine's hazard class is write conflicts in parallel event application, so
these checks verify after every step (in tests, or under a debug flag):

* topology mutuality: a_trans/b_partner and a_cis cross-link consistently
  (reference writes both sides by hand, main.cpp:1926-1928, 1994-1995);
* hard-sphere exclusion: no overlaps at the reference collision radii
  *between clusters* (the reference allows transient intra-complex
  proximity during alignment but reverts inter-complex overlap);
* counter consistency: bond_num == rl + cis + mono_cis (main.cpp:1931-1938).

All functions return jnp bool scalars so they compose with jax.jit /
checkify; the ``assert_*`` wrappers raise on host.
"""

from __future__ import annotations

import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.clusters import cluster_labels
from kmc_tpu.engine.diffusion import collide_matrix
from kmc_tpu.engine.observables import bond_counters
from kmc_tpu.state import SimState, positions


def topology_mutual(state: SimState, cfg: SimConfig):
    na, nb = cfg.n_a, cfg.n_b
    ai = jnp.arange(na)

    # trans: a_trans[i] = b, a_site[i] = s  <=>  b_partner[b-na, s-1] = i
    has = state.a_trans >= 0
    b = jnp.clip(state.a_trans - na, 0, nb - 1)
    s = jnp.clip(state.a_site - 1, 0, 2)
    ok_t = jnp.all(jnp.where(has, state.b_partner[b, s] == ai, True))
    ok_t &= jnp.all(has == (state.a_site >= 0))

    # every b_partner entry points back
    bp = state.b_partner
    bb, ss = jnp.meshgrid(jnp.arange(nb), jnp.arange(3), indexing="ij")
    has_b = bp >= 0
    pa = jnp.clip(bp, 0, na - 1)
    ok_b = jnp.all(
        jnp.where(
            has_b,
            (state.a_trans[pa] == bb + na) & (state.a_site[pa] == ss + 1),
            True,
        )
    )

    # cis: symmetric, no self-link
    has_c = state.a_cis >= 0
    pc = jnp.clip(state.a_cis, 0, na - 1)
    ok_c = jnp.all(jnp.where(has_c, (state.a_cis[pc] == ai) & (pc != ai), True))
    return ok_t & ok_b & ok_c


def no_cross_cluster_overlap(state: SimState, cfg: SimConfig, slack=1e-3):
    p = positions(state, cfg)
    info = cluster_labels(state, cfg)
    hit = collide_matrix(p, p, cfg)
    cross = info.label[:, None] != info.label[None, :]
    return ~jnp.any(hit & cross)


def counters_consistent(state: SimState, cfg: SimConfig):
    rl, mono, cis, total = bond_counters(state, cfg)
    return total == rl + mono + cis


def assert_invariants(state: SimState, cfg: SimConfig, where: str = ""):
    assert bool(topology_mutual(state, cfg)), f"topology not mutual {where}"
    assert bool(no_cross_cluster_overlap(state, cfg)), f"overlap {where}"
    assert bool(counters_consistent(state, cfg)), f"counters {where}"
