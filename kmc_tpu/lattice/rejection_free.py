"""Rejection-free (BKL/Gillespie) event selection for the lattice engine.

The reference is a FIXED-TIMESTEP diffusion-reaction algorithm: every
channel is tested against rate*dt each step (main.cpp:1918-1921, 2069-2071)
and almost all draws are rejections — the serial rate scan of
main.cpp:1877-2058 walks every pair every step.  The rejection-free mode
replaces that scan with the TPU-native form called for by the BASELINE
north star: build the dense per-site rate tensor, select the ONE firing
event by **Gumbel-max** (argmax of log-rate + Gumbel noise — the standard
reparameterization of categorical sampling, equivalent to the segmented
prefix-sum inverse-CDF walk but a single fused reduction on device), and
advance continuous time by Exp(1)/total_rate.  No step is ever wasted: in
sparse/low-rate regimes (late-stage coarsening, small diss_prob) one event
can leap what the fixed-dt engine spends thousands of steps rejecting
through.

Rates are expressed in per-step units matched to lattice/step.py's
effective per-direction probabilities, so the two modes share one time
axis (state.time) and one equilibrium:

  hop(cell -> empty d-neighbor):   hop_prob / (4k)   [axis 1/2 x sign 1/2]
  merge(cell absorbs d-neighbor):  ass_prob / 8      [direction 1/4 x parity 1/2]
  split(cell ejects monomer to d): diss_prob / 8     [direction 1/4 x parity 1/2]

Equilibrium equality between the modes is asserted statistically in
tests/test_rejection_free.py.

All randomness is the stateless counter hash (ops/hashing.py) keyed by the
EVENT counter (state.step doubles as events-applied in this mode), so the
trajectory is reproducible and vmappable across replicas via the seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import MAX_SPECIES, LatticeState
from kmc_tpu.lattice.step import _DIRS

# static python copy for trace-time loop unrolling (indexing the jnp
# module constant under jit yields tracers)
_DIR_TUPLES = ((0, 1), (1, 0), (0, -1), (-1, 0))
from kmc_tpu.ops.hashing import cell_uniform, scalar_uniforms

# Stream salts live in the same seed*16+stream space as lattice/step.py's
# 0..4; Gumbel channels take 8..15 and the waiting-time draw takes 5, so
# consecutive replica seeds (seed*16 apart) can never alias a neighbor's
# stream (all salts are distinct mod 16).
SALT_RF_GUMBEL = 8    # per-(cell, channel) Gumbel draws: 8..15
SALT_RF_TIME = 5      # per-event exponential waiting-time draw

_TINY = jnp.float32(1e-12)


def event_rates(grid: jax.Array, cfg: LatticeConfig) -> jax.Array:
    """Dense per-site rate tensor f32[8, H, W]: channels 0..3 = move/merge
    toward _DIRS[c], channels 4..7 = monomer ejection toward _DIRS[c-4].
    A move channel's rate is hop_prob/(4k) when the neighbor is empty and
    ass_prob/8 when occupied and the merged size fits (else 0)."""
    k = grid
    occ = k > 0
    hop = jnp.float32(0.25) * jnp.float32(cfg.hop_prob) / jnp.maximum(
        k, 1
    ).astype(jnp.float32)
    mrg = jnp.float32(cfg.ass_prob / 8.0)
    spl = jnp.float32(cfg.diss_prob / 8.0)

    chans = []
    for c in range(4):
        dy, dx = _DIR_TUPLES[c]
        nb = jnp.roll(k, shift=(-dy, -dx), axis=(0, 1))
        can_hop = occ & (nb == 0)
        can_mrg = occ & (nb > 0) & (k + nb <= MAX_SPECIES)
        chans.append(
            jnp.where(can_hop, hop, jnp.where(can_mrg, mrg, 0.0))
        )
    for c in range(4):
        dy, dx = _DIR_TUPLES[c]
        nb = jnp.roll(k, shift=(-dy, -dx), axis=(0, 1))
        can_spl = (k >= 2) & (nb == 0)
        chans.append(jnp.where(can_spl, spl, 0.0))
    return jnp.stack(chans)


def _gumbel_field(shape, step, salt):
    u = cell_uniform(shape, step, salt)
    return -jnp.log(-jnp.log(jnp.maximum(u, _TINY)))


def rf_step(state: LatticeState, cfg: LatticeConfig) -> LatticeState:
    """Apply ONE event: Gumbel-max winner over the full rate tensor, then
    the corresponding move/merge/split, then time += Exp(1)/total_rate.
    A state with zero total rate (fully jammed) is returned unchanged with
    time advanced to +inf-free saturation (rate floor keeps dt finite)."""
    h, w = state.grid.shape
    rates = event_rates(state.grid, cfg)                   # [8, H, W]
    total = jnp.sum(rates)

    salt = state.seed * 16
    scores = jnp.stack(
        [
            jnp.log(jnp.maximum(rates[c], _TINY))
            + _gumbel_field((h, w), state.step, salt + SALT_RF_GUMBEL + c)
            for c in range(8)
        ]
    )
    scores = jnp.where(rates > 0, scores, -jnp.inf)
    flat = jnp.argmax(scores)
    c = flat // (h * w)
    y = (flat % (h * w)) // w
    x = flat % w

    d = _DIRS[c % 4]
    ty = jnp.mod(y + d[0], h)
    tx = jnp.mod(x + d[1], w)

    k = state.grid[y, x]
    k2 = state.grid[ty, tx]
    is_split = c >= 4
    is_merge = (~is_split) & (k2 > 0)

    # source cell: hop empties it, merge absorbs the neighbor INTO it
    # (matching _react_substep's source-keeps convention), split loses 1
    src_val = jnp.where(is_split, k - 1, jnp.where(is_merge, k + k2, 0))
    tgt_val = jnp.where(is_split, 1, jnp.where(is_merge, 0, k))
    grid = state.grid.at[y, x].set(src_val).at[ty, tx].set(tgt_val)

    dvec = d.astype(jnp.int32)
    sdisp = state.disp[y, x]
    tdisp = state.disp[ty, tx]
    # hop: displacement rides along; merge: absorbed neighbor's history
    # dropped (source keeps its own, as in _react_substep); split: the
    # ejected monomer inherits the parent's displacement
    new_sdisp = jnp.where(is_split | is_merge, sdisp, jnp.zeros_like(sdisp))
    new_tdisp = jnp.where(
        is_split, sdisp, jnp.where(is_merge, jnp.zeros_like(tdisp),
                                   sdisp + dvec)
    )
    disp = state.disp.at[y, x].set(new_sdisp).at[ty, tx].set(new_tdisp)

    # no-event guard (total == 0): keep everything, freeze time advance
    any_event = total > 0
    grid = jnp.where(any_event, grid, state.grid)
    disp = jnp.where(any_event, disp, state.disp)

    u_t = scalar_uniforms(1, state.step, salt + SALT_RF_TIME)[0]
    dt = -jnp.log(jnp.maximum(u_t, _TINY)) / jnp.maximum(total, _TINY)
    dt = jnp.where(any_event, dt, 0.0)

    return state._replace(
        grid=grid,
        disp=disp,
        step=state.step + 1,
        time=state.time + dt.astype(jnp.float32),
    )


def make_rf_step(cfg: LatticeConfig):
    return jax.jit(functools.partial(rf_step, cfg=cfg))


def rf_batch_step(state: LatticeState, cfg: LatticeConfig,
                  k_events: int = 64, exclusion: int = 3,
                  thinning: str = "parallel") -> LatticeState:
    """Apply up to ``k_events`` spatially separated events in ONE pass —
    the throughput form of rejection-free selection (VERDICT r2 #7: the
    serial rf_step does O(HW) work per single event).

    Selection: top-K Gumbel-max winners over the frozen rate tensor, then
    a thinning that keeps an event only if both its cells are at Chebyshev
    distance >= ``exclusion`` (periodic) from every higher-scored kept
    candidate's cells.  Rates depend on 4-neighborhoods, so with
    exclusion >= 3 the kept events' rate neighborhoods are disjoint: the
    K' kept events COMMUTE and each was selected from a rate field
    unperturbed by the others — identical to applying them serially in
    score order.  The residual approximation vs serial BKL is temporal:
    all K' waiting times are drawn against the same frozen total rate
    (time += sum of K' Exp(1) draws / total_rate), i.e. rate-field drift
    WITHIN a batch is ignored.  Statistical equivalence to the serial form
    is asserted in tests/test_rejection_free.py::test_batched_equilibrium.

    ``thinning`` picks the independent-set rule (VERDICT r4 #7):
      "greedy"   — sequential in score order (keep i iff it conflicts with
                   no KEPT j < i): keeps the most events per batch but runs
                   a k_events-iteration fori_loop of scalar-sized ops — the
                   dominant per-batch cost on TPU at k >= 64.
      "parallel" — one-shot (keep i iff it conflicts with no CANDIDATE
                   j < i, kept or not): a single vectorized mask.  Every
                   kept event still conflicts with no higher-scored kept
                   event (kept is a subset of candidates), so the
                   commutation argument above holds unchanged; it merely
                   thins more aggressively when candidates crowd, trading
                   a few events/batch for removing the sequential loop.

    ``state.step`` counts BATCHES here (one hash-stream index per call);
    events applied per call = K' <= k_events.
    """
    h, w = state.grid.shape
    rates = event_rates(state.grid, cfg)                   # [8, H, W]
    total = jnp.sum(rates)

    salt = state.seed * 16
    scores = jnp.stack(
        [
            jnp.log(jnp.maximum(rates[c], _TINY))
            + _gumbel_field((h, w), state.step, salt + SALT_RF_GUMBEL + c)
            for c in range(8)
        ]
    )
    scores = jnp.where(rates > 0, scores, -jnp.inf)
    top_scores, flat = jax.lax.top_k(scores.reshape(-1), k_events)
    live = jnp.isfinite(top_scores)                        # real candidates
    c = flat // (h * w)
    y = (flat % (h * w)) // w
    x = flat % w
    d = _DIRS[jnp.mod(c, 4)]                               # [K, 2]
    ty = jnp.mod(y + d[:, 0], h)
    tx = jnp.mod(x + d[:, 1], w)

    # pairwise conflict: any of the 4 cell pairs closer than `exclusion`
    def chebdist(ay, ax, by, bx):
        dy = jnp.abs(ay[:, None] - by[None, :])
        dx = jnp.abs(ax[:, None] - bx[None, :])
        dy = jnp.minimum(dy, h - dy)
        dx = jnp.minimum(dx, w - dx)
        return jnp.maximum(dy, dx)

    dmin = jnp.minimum(
        jnp.minimum(chebdist(y, x, y, x), chebdist(y, x, ty, tx)),
        jnp.minimum(chebdist(ty, tx, y, x), chebdist(ty, tx, ty, tx)),
    )
    conflict = dmin < exclusion                            # [K, K]

    if thinning == "parallel":
        # one-shot rule: drop i iff ANY higher-scored candidate conflicts
        # (top_k output is score-sorted, so j < i means higher score)
        ii = jnp.arange(k_events)
        blocked = jnp.any(conflict & live[None, :]
                          & (ii[None, :] < ii[:, None]), axis=1)
        keep = live & ~blocked
    else:
        # greedy independent set in score order
        def pick(i, keep):
            ok = ~jnp.any(conflict[i] & keep & (jnp.arange(k_events) < i))
            return keep.at[i].set(ok & live[i])

        keep = jax.lax.fori_loop(0, k_events, pick,
                                 jnp.zeros((k_events,), bool))

    # per-event source/target values (same semantics as rf_step)
    k1 = state.grid[y, x]
    k2 = state.grid[ty, tx]
    is_split = c >= 4
    is_merge = (~is_split) & (k2 > 0)
    src_val = jnp.where(is_split, k1 - 1, jnp.where(is_merge, k1 + k2, 0))
    tgt_val = jnp.where(is_split, 1, jnp.where(is_merge, 0, k1))

    # kept events touch disjoint cells -> commutative ADD of deltas
    # (non-kept events contribute zero; duplicate indices then only ever
    # add zeros, so scatter-add order cannot matter)
    ki = keep.astype(state.grid.dtype)
    grid = (state.grid
            .at[y, x].add((src_val - k1) * ki)
            .at[ty, tx].add((tgt_val - k2) * ki))

    sdisp = state.disp[y, x]                               # [K, 2]
    tdisp = state.disp[ty, tx]
    new_sdisp = jnp.where((is_split | is_merge)[:, None], sdisp,
                          jnp.zeros_like(sdisp))
    new_tdisp = jnp.where(
        is_split[:, None], sdisp,
        jnp.where(is_merge[:, None], jnp.zeros_like(tdisp),
                  sdisp + d.astype(jnp.int32)),
    )
    kd = keep[:, None].astype(state.disp.dtype)
    disp = (state.disp
            .at[y, x].add((new_sdisp - sdisp) * kd)
            .at[ty, tx].add((new_tdisp - tdisp) * kd))

    # waiting time: sum of K' Exp(1) draws over the frozen total rate
    u_t = scalar_uniforms(k_events, state.step, salt + SALT_RF_TIME)
    exp1 = -jnp.log(jnp.maximum(u_t, _TINY))
    n_kept = jnp.sum(keep)
    dt = jnp.sum(jnp.where(keep, exp1, 0.0)) / jnp.maximum(total, _TINY)
    dt = jnp.where(n_kept > 0, dt, 0.0)

    return state._replace(
        grid=grid, disp=disp, step=state.step + 1,
        time=state.time + dt.astype(jnp.float32),
    )


def make_rf_batch_chunk(cfg: LatticeConfig, n_batches: int,
                        k_events: int = 64, exclusion: int = 3,
                        thinning: str = "parallel"):
    """Jitted ``n_batches``-batch advance; returns (state, dts) where
    ``dts[i]`` is batch i's accumulated waiting time (zero iff that batch
    applied no events).

    Like ``_make_rf_chunk_dt``, time accumulates from ZERO within the chunk
    and is added to the start time once — so a long-run f32 time axis does
    not stall once a batch dt drops below ulp(time) (ADVICE r2/r3)."""

    @jax.jit
    def f(state: LatticeState):
        t0 = state.time
        state = state._replace(time=jnp.zeros_like(state.time))

        def inner(st, _):
            st2 = rf_batch_step(st, cfg, k_events, exclusion, thinning)
            return st2, st2.time - st.time

        state, dts = jax.lax.scan(inner, state, None, length=n_batches)
        return state._replace(time=t0 + state.time), dts

    return f


def _make_rf_chunk_dt(cfg: LatticeConfig, n_events: int):
    """Jitted ``n_events``-event advance returning (state, chunk_dt).

    Per-event dts are accumulated from ZERO within the chunk and added to
    the start time once — compensated summation, so a long-run f32 time
    accumulator no longer stalls when a single dt drops below ulp(time)
    (ADVICE r2: the stall mis-reported active systems as jammed)."""

    @jax.jit
    def f(state: LatticeState):
        t0 = state.time
        state = state._replace(time=jnp.zeros_like(state.time))

        def inner(st, _):
            return rf_step(st, cfg), None

        state, _ = jax.lax.scan(inner, state, None, length=n_events)
        dt = state.time
        return state._replace(time=t0 + dt), dt

    return f


def make_rf_chunk(cfg: LatticeConfig, n_events: int):
    """Jitted ``n_events``-event advance under one lax.scan."""
    f = _make_rf_chunk_dt(cfg, n_events)

    def g(state: LatticeState) -> LatticeState:
        return f(state)[0]

    return g


def run_until(state: LatticeState, cfg: LatticeConfig, t_end: float,
              chunk: int = 256) -> LatticeState:
    """Advance events until state.time >= t_end (host loop over jitted
    chunks; the final chunk may overshoot by O(chunk/total_rate)).

    Jamming is detected from the chunk's accumulated waiting time: rf_step
    emits dt > 0 for every applied event and exactly 0 when the total rate
    is zero, so chunk_dt == 0 iff NO event fired in the whole chunk — a
    rate-based test immune to f32 time-accumulator resolution."""
    f = _make_rf_chunk_dt(cfg, chunk)
    while float(state.time) < t_end:
        state, dt = f(state)
        if float(dt) == 0.0:                              # zero events: jammed
            break
    return state
