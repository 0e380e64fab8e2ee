#!/usr/bin/env python
"""Rejection-free throughput on TPU: serial Gumbel-max vs batched
(spatial-exclusion top-K) vs the fixed-dt engine, in a DENSE regime and a
SPARSE late-coarsening regime (low dissociation), with the crossover
analysis (VERDICT r2 #7 / r3 #4).

Physics of the comparison: fixed-dt does O(HW) work per STEP and advances
wall-clock-per-simulated-event proportional to the event density; the
rejection-free sampler (replacing the reference's serial event pick,
main.cpp:1877-2058, with Gumbel-max selection over the rate tensor) does
O(HW) work per K events regardless of density.  Rejection-free therefore
wins when events-per-step drops below (batched-RF events/s) / (fixed-dt
steps/s) — exactly the late-coarsening regime where almost every site is
static.  Prints one JSON line per (regime, mode).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

H = W = int(os.environ.get("KMC_RF_SIZE", "512"))
REPEATS = int(os.environ.get("KMC_RF_REPEATS", "3"))

REGIMES = {
    # reference-like active regime: 3.8% occupancy, high rates
    "dense": dict(n_particles=10000, hop_prob=0.3, ass_prob=0.4,
                  diss_prob=0.2),
    # late coarsening: low occupancy of MOBILE mass — most particles locked
    # in clusters (high association, ~zero dissociation), few live events
    "sparse_coarsen": dict(n_particles=2000, hop_prob=0.05, ass_prob=0.4,
                           diss_prob=0.002),
    # deep coarsening: almost everything bound, a handful of live events
    # per fixed-dt step — near the measured crossover
    "frozen": dict(n_particles=400, hop_prob=0.02, ass_prob=0.5,
                   diss_prob=0.0005),
    # terminal coarsening: ~1 live event per fixed-dt step; fixed-dt burns
    # a full-grid update per event while batched RF amortizes the grid scan
    # over K of them
    "terminal": dict(n_particles=200, hop_prob=0.01, ass_prob=0.5,
                     diss_prob=0.0001),
}


def bench_regime(name, n_particles, **probs):
    from kmc_tpu.config import LatticeConfig
    from kmc_tpu.lattice.grid import init_lattice
    from kmc_tpu.lattice.rejection_free import (
        event_rates, make_rf_batch_chunk, make_rf_chunk)
    from kmc_tpu.lattice.step import make_lattice_chunk

    cfg = LatticeConfig(height=H, width=W, **probs)
    st0 = jax.block_until_ready(init_lattice(cfg, seed=0,
                                             n_particles=n_particles))
    # age the system into the regime's steady state first (coarsening needs
    # bound clusters to exist before rates are representative)
    age = make_lattice_chunk(cfg, 500)
    st0 = jax.block_until_ready(age(st0))
    out = []

    # ---- serial rejection-free: one event per scan iteration ----
    n_ev = 2000
    chunk = make_rf_chunk(cfg, n_ev)
    st = jax.block_until_ready(chunk(st0))
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        st = chunk(st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / REPEATS
    rf_serial = n_ev / dt
    out.append({"regime": name, "mode": "rf_serial",
                "events_per_s": rf_serial, "grid": H})

    # ---- batched rejection-free (k_events x thinning sweep; VERDICT r4
    # #7: the greedy rule's k-iteration fori_loop was the suspected
    # per-batch floor — the parallel one-shot rule removes it) ----
    best_batched = 0.0
    # greedy-vs-parallel head-to-head only in the regimes where batched RF
    # is competitive (each (regime, k, thinning) is its own ~minute-long
    # tunnel compile; the dense regimes are fixed-dt territory anyway)
    thinnings = (("greedy", "parallel") if name in ("frozen", "terminal")
                 else ("parallel",))
    for k in (64, 256):
        for thinning in thinnings:
            n_b = 200
            bchunk = make_rf_batch_chunk(cfg, n_b, k_events=k,
                                         thinning=thinning)
            st, dts = bchunk(st0)
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            for _ in range(REPEATS):
                st, dts = bchunk(st)
            jax.block_until_ready(st)
            dt = (time.perf_counter() - t0) / REPEATS
            # events/batch = dt_batch * total_rate (Exp(1) waits have mean
            # 1); measured on the final chunk's own dts vs its start rates
            tot = float(jnp.sum(event_rates(st.grid, cfg)))
            ev_per_batch = float(jnp.mean(dts)) * tot
            ev_s = n_b / dt * ev_per_batch
            best_batched = max(best_batched, ev_s)
            out.append({"regime": name, "mode": f"rf_batch_k{k}_{thinning}",
                        "batches_per_s": n_b / dt,
                        "events_per_batch_est": ev_per_batch,
                        "events_per_s": ev_s, "grid": H})

    # ---- fixed-dt engine ----
    n_steps = 200
    fchunk = make_lattice_chunk(cfg, n_steps)
    st = jax.block_until_ready(fchunk(st0))
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        st = fchunk(st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / REPEATS
    steps_per_s = n_steps / dt
    # realized events per fixed-dt step = total event rate of the aged state
    tot = float(jnp.sum(event_rates(st.grid, cfg)))
    out.append({"regime": name, "mode": "fixed_dt",
                "steps_per_s": steps_per_s,
                "site_updates_per_s": steps_per_s * H * W,
                "events_per_step_realized": tot,
                "events_per_s_equiv": steps_per_s * tot, "grid": H})

    # ---- crossover: events/step below which batched RF wins ----
    out.append({"regime": name, "mode": "crossover",
                "batched_rf_events_per_s": best_batched,
                "fixed_dt_steps_per_s": steps_per_s,
                "events_per_step_crossover": best_batched / steps_per_s,
                "events_per_step_realized": tot,
                "rf_wins_here": bool(tot < best_batched / steps_per_s)})
    return out


def main():
    all_out = []
    for name, kw in REGIMES.items():
        all_out += bench_regime(name, **kw)
    for o in all_out:
        print(json.dumps(o), flush=True)
    out_path = os.environ.get("KMC_RF_OUT")
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(all_out, indent=1) + "\n")


if __name__ == "__main__":
    main()
