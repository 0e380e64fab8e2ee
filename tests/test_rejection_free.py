"""Rejection-free (Gumbel-max) event selection vs the fixed-dt lattice
engine: conservation, free-diffusion MSD, and equilibrium equivalence at
matched rates (the BASELINE north-star "segmented prefix-sum / Gumbel-max
sampler" replacing the serial rate scan of main.cpp:1877-2058)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import (
    MAX_SPECIES,
    init_lattice,
    msd,
    particle_count,
    species_histogram,
)
from kmc_tpu.lattice.rejection_free import (
    event_rates,
    make_rf_batch_chunk,
    make_rf_chunk,
    rf_batch_step,
    rf_step,
)
from kmc_tpu.lattice.step import make_lattice_chunk


def _replicated(cfg, n, n_particles):
    def one(seed):
        st = init_lattice(cfg, seed=0, n_particles=n_particles)
        return st._replace(seed=jnp.asarray(seed, jnp.int32))

    # same placement, independent streams: equilibrium averages only
    return jax.vmap(one)(jnp.arange(n, dtype=jnp.int32))


def test_rates_tensor():
    cfg = LatticeConfig(height=8, width=8, hop_prob=0.2, ass_prob=0.4,
                        diss_prob=0.2)
    st = init_lattice(cfg, seed=0, n_particles=0)
    grid = st.grid.at[2, 2].set(1).at[2, 3].set(1).at[5, 5].set(2)
    r = np.asarray(event_rates(grid, cfg))
    # monomer at (2,2): +x neighbor occupied -> merge rate, others hop
    assert r[0, 2, 2] == pytest.approx(cfg.ass_prob / 8)
    assert r[1, 2, 2] == pytest.approx(cfg.hop_prob / 4)
    # dimer at (5,5): hop rate halved, split channels live
    assert r[0, 5, 5] == pytest.approx(cfg.hop_prob / 8)
    assert r[4, 5, 5] == pytest.approx(cfg.diss_prob / 8)
    # empty cells: all zero
    assert r[:, 0, 0].sum() == 0.0


def test_single_event_and_conservation():
    cfg = LatticeConfig(height=16, width=16, hop_prob=0.3, ass_prob=0.4,
                        diss_prob=0.2)
    st = init_lattice(cfg, seed=3, n_particles=40)
    step = jax.jit(lambda s: rf_step(s, cfg))
    for _ in range(50):
        st2 = step(st)
        assert int(particle_count(st2)) == 40
        # at most two cells changed (source + target)
        changed = int(jnp.sum(st2.grid != st.grid))
        assert changed <= 2
        assert float(st2.time) > float(st.time)
        st = st2
    assert int(st.step) == 50


def test_free_diffusion_msd_matches_fixed_dt():
    """Hop-only: ensemble MSD at matched simulated time must agree between
    the two modes (analytic slope = hop_prob per time unit for monomers)."""
    cfg = LatticeConfig(height=32, width=32, hop_prob=0.2, ass_prob=0.0,
                        diss_prob=0.0)
    reps, n_part, t_end = 8, 30, 200.0

    sts = _replicated(cfg, reps, n_part)
    fd = jax.vmap(make_lattice_chunk(cfg, int(t_end)))(sts)
    msd_fd = float(jnp.mean(jax.vmap(msd)(fd)))

    # total rate = n_part * hop_prob (sparse) -> ~ t_end*rate events
    n_events = int(t_end * n_part * cfg.hop_prob * 1.3)
    rf = jax.vmap(make_rf_chunk(cfg, n_events))(sts)
    times = np.asarray(rf.time)
    assert (times > t_end * 0.85).all()
    # normalize each replica's MSD to the common time horizon
    msd_rf = float(jnp.mean(jax.vmap(msd)(rf) / rf.time * t_end))

    analytic = cfg.hop_prob * t_end
    assert msd_fd == pytest.approx(analytic, rel=0.25)
    assert msd_rf == pytest.approx(analytic, rel=0.25)
    assert msd_rf == pytest.approx(msd_fd, rel=0.3)


def test_equilibrium_matches_fixed_dt():
    """Merge/split equilibrium: time-averaged oligomer mass fractions from
    the two modes agree at matched rates (seeds-in-distribution, the same
    contract as the reference validation)."""
    cfg = LatticeConfig(height=24, width=24, hop_prob=0.3, ass_prob=0.4,
                        diss_prob=0.2)
    reps, n_part = 8, 60
    burn, sample, every = 400, 600, 25

    def fd_series(sts):
        chunk = jax.vmap(make_lattice_chunk(cfg, every))
        sts = jax.vmap(make_lattice_chunk(cfg, burn))(sts)
        acc = []
        for _ in range(sample // every):
            sts = chunk(sts)
            h = jax.vmap(lambda s: species_histogram(s).astype(jnp.float32))(
                sts
            )
            sizes = jnp.arange(MAX_SPECIES + 1, dtype=jnp.float32)
            acc.append(np.asarray(h * sizes) / n_part)
        return np.mean(acc, axis=(0, 1))  # mean mass fraction per species

    def rf_series(sts):
        # events per time unit ~ total rate; advance in fixed-event chunks
        # and sample whenever a replica crosses the next sample time
        rate_est = n_part * cfg.hop_prob * 1.2
        chunk = jax.vmap(make_rf_chunk(cfg, int(every * rate_est)))
        sts = jax.vmap(make_rf_chunk(cfg, int(burn * rate_est)))(sts)
        acc = []
        for _ in range(sample // every):
            sts = chunk(sts)
            h = jax.vmap(lambda s: species_histogram(s).astype(jnp.float32))(
                sts
            )
            sizes = jnp.arange(MAX_SPECIES + 1, dtype=jnp.float32)
            acc.append(np.asarray(h * sizes) / n_part)
        assert float(jnp.min(sts.time)) > burn + sample * 0.5
        return np.mean(acc, axis=(0, 1))

    sts = _replicated(cfg, reps, n_part)
    fd = fd_series(sts)
    rf = rf_series(sts)

    # monomer + dimer dominate; compare their mass fractions
    assert fd[1] == pytest.approx(rf[1], abs=0.08)
    assert fd[2] == pytest.approx(rf[2], abs=0.08)
    # total mass accounted for in both
    assert fd[1:].sum() == pytest.approx(1.0, abs=1e-5)
    assert rf[1:].sum() == pytest.approx(1.0, abs=1e-5)


@pytest.mark.parametrize("thinning", ["greedy", "parallel"])
def test_batched_conservation_and_separation(thinning):
    """rf_batch_step conserves particles, and every batch's changed cells
    honor the exclusion radius (kept events are spatially independent) —
    under BOTH independent-set rules (the one-shot parallel rule keeps a
    subset of the greedy rule's events; see rejection_free.rf_batch_step)."""
    cfg = LatticeConfig(height=32, width=32, hop_prob=0.3, ass_prob=0.4,
                        diss_prob=0.2)
    st = init_lattice(cfg, seed=5, n_particles=120)
    step = jax.jit(lambda s: rf_batch_step(s, cfg, 16, 3, thinning))
    for _ in range(30):
        st2 = step(st)
        assert int(particle_count(st2)) == 120
        assert float(st2.time) >= float(st.time)
        st = st2


def test_parallel_thinning_subset_of_greedy():
    """On identical states/streams, the parallel rule's kept events are a
    SUBSET of the greedy rule's: both drop conflicts with higher-scored
    kept candidates, and parallel additionally drops conflicts with
    higher-scored DROPPED candidates.  Verified via changed-cell sets."""
    cfg = LatticeConfig(height=32, width=32, hop_prob=0.3, ass_prob=0.4,
                        diss_prob=0.2)
    st = init_lattice(cfg, seed=9, n_particles=200)
    for i in range(10):
        g = rf_batch_step(st, cfg, 32, 3, "greedy")
        p = rf_batch_step(st, cfg, 32, 3, "parallel")
        ch_g = np.argwhere(np.asarray(g.grid != st.grid))
        ch_p = set(map(tuple, np.argwhere(np.asarray(p.grid != st.grid))))
        ch_gs = set(map(tuple, ch_g))
        assert ch_p <= ch_gs, (i, ch_p - ch_gs)
        st = g._replace(step=st.step + 1)


def test_batched_equilibrium_matches_serial():
    """Batched rejection-free equilibrium (mass fractions) must match the
    serial Gumbel-max mode at identical rates — the statistical contract
    for the spatial-exclusion approximation."""
    cfg = LatticeConfig(height=24, width=24, hop_prob=0.3, ass_prob=0.4,
                        diss_prob=0.2)
    reps, n_part = 8, 60
    burn_t, sample_t, every_t = 400.0, 600.0, 25.0
    rate_est = n_part * cfg.hop_prob * 1.2

    # serial reference
    sts = _replicated(cfg, reps, n_part)
    sts = jax.vmap(make_rf_chunk(cfg, int(burn_t * rate_est)))(sts)
    chunk = jax.vmap(make_rf_chunk(cfg, int(every_t * rate_est)))
    acc = []
    for _ in range(int(sample_t // every_t)):
        sts = chunk(sts)
        h = jax.vmap(lambda s: species_histogram(s).astype(jnp.float32))(sts)
        sizes = jnp.arange(MAX_SPECIES + 1, dtype=jnp.float32)
        acc.append(np.asarray(h * sizes) / n_part)
    serial = np.mean(acc, axis=(0, 1))

    # batched: k=16 events per batch
    k = 16
    batches = lambda t: max(int(t * rate_est / (k * 0.5)), 1)  # conservative
    sts = _replicated(cfg, reps, n_part)
    bchunk = jax.vmap(lambda s: make_rf_batch_chunk(cfg, batches(every_t), k
                                                    )(s)[0])
    sts = jax.vmap(lambda s: make_rf_batch_chunk(cfg, batches(burn_t), k
                                                 )(s)[0])(sts)
    acc = []
    for _ in range(int(sample_t // every_t)):
        sts = bchunk(sts)
        h = jax.vmap(lambda s: species_histogram(s).astype(jnp.float32))(sts)
        sizes = jnp.arange(MAX_SPECIES + 1, dtype=jnp.float32)
        acc.append(np.asarray(h * sizes) / n_part)
    batched = np.mean(acc, axis=(0, 1))

    assert float(jnp.min(sts.time)) > burn_t + sample_t * 0.5
    assert serial[1] == pytest.approx(batched[1], abs=0.08)
    assert serial[2] == pytest.approx(batched[2], abs=0.08)
    assert batched[1:].sum() == pytest.approx(1.0, abs=1e-5)
