"""Reference-physics -> lattice mapping (BASELINE configs 2/3): formula
values, mapped-MSD agreement with the reference's analytic 2*D*dt/9, and
mapped reaction-rate agreement between engines."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmc_tpu.config import SimConfig
from kmc_tpu.lattice.grid import init_lattice, msd, species_histogram
from kmc_tpu.lattice.mapping import (
    msd_per_step_A2,
    reference_lattice_config,
)
from kmc_tpu.lattice.rejection_free import run_until
from kmc_tpu.lattice.step import make_lattice_chunk


def test_mapping_formulas():
    cfg = SimConfig()
    lcfg = reference_lattice_config(cfg, spacing=20.0, species="receptor",
                                    reaction="mono_cis")
    # hop = 2*D*dt/(9*a^2) = 2*1*10/(9*400)
    assert lcfg.hop_prob == pytest.approx(2 * 1.0 * 10.0 / (9 * 400))
    # ass = 8*k*dt (A-A pairs double-scanned in the reference)
    assert lcfg.ass_prob == pytest.approx(8 * 4.7e-5 * 10.0)
    assert lcfg.diss_prob == pytest.approx(2 * 1.12e-13 * 10.0)
    # reference surface density: 150 molecules of footprint a^2 in the box
    assert lcfg.density == pytest.approx(150 * 400 / 5773.0**2, rel=1e-6)
    lig = reference_lattice_config(cfg, spacing=20.0, species="ligand")
    assert lig.hop_prob == pytest.approx(2 * 7.2614 * 10.0 / (9 * 400))
    assert msd_per_step_A2(cfg, "receptor") == pytest.approx(20.0 / 9.0)


def test_mapped_msd_matches_reference_analytic():
    """Config-2 (reduced 256x256/2.5k here; full 512x512/10k in
    scripts/validate_lattice_physics.py): lattice MSD per step at the
    mapped hop probability reproduces the reference's 2*D*dt/9 within the
    few-percent hard-sphere suppression at this density."""
    cfg = SimConfig()
    lcfg = reference_lattice_config(cfg, spacing=20.0, species="receptor",
                                    height=256, width=256)
    lcfg = lcfg.replace(ass_prob=0.0, diss_prob=0.0)
    steps = 1500
    st = init_lattice(lcfg, seed=1, n_particles=2500)
    st = make_lattice_chunk(lcfg, steps)(st)
    measured = float(msd(st)) * 20.0**2 / steps
    analytic = msd_per_step_A2(cfg, "receptor")
    assert measured == pytest.approx(analytic, rel=0.1)


def test_mapped_rates_fd_rf_agree():
    """At mapped mono-cis rates the fixed-dt and rejection-free engines
    produce matching oligomer histograms at matched simulated time."""
    cfg = SimConfig()
    lcfg = reference_lattice_config(cfg, spacing=20.0, reaction="mono_cis",
                                    height=64, width=64, density=0.3)
    st0 = init_lattice(lcfg, seed=0)
    T = 300
    fd = np.asarray(species_histogram(make_lattice_chunk(lcfg, T)(st0)))
    rf_state = run_until(st0, lcfg, float(T), chunk=64)
    rf = np.asarray(species_histogram(rf_state))
    assert float(rf_state.time) == pytest.approx(T, rel=0.05)
    for s in (1, 2):
        assert abs(int(fd[s]) - int(rf[s])) <= 0.2 * max(int(fd[s]), 25)
