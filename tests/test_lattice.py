"""Tests for the lattice engine: conservation, diffusion rate, reactions,
and sharding-invariance of trajectories."""

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import (
    MAX_SPECIES,
    init_lattice,
    msd,
    particle_count,
    species_histogram,
)
from kmc_tpu.lattice.step import (
    make_lattice_chunk,
    make_lattice_step,
    make_sharded_lattice_step,
)


def test_mass_conservation():
    cfg = LatticeConfig(height=64, width=64, density=0.1, ass_prob=0.3,
                        diss_prob=0.05)
    st = init_lattice(cfg, seed=0)
    n0 = int(particle_count(st))
    st = make_lattice_chunk(cfg, 200)(st)
    assert int(particle_count(st)) == n0
    assert int(st.step) == 200


def test_exact_particle_count():
    cfg = LatticeConfig(height=32, width=32)
    st = init_lattice(cfg, seed=1, n_particles=100)
    assert int(particle_count(st)) == 100


def test_diffusion_only_msd():
    """Signed two-pass hopping: every monomer attempts each step with its
    own sign, so at low density MSD/step ~= hop_prob * (1 - density)."""
    cfg = LatticeConfig(height=128, width=128, density=0.02, ass_prob=0.0,
                        diss_prob=0.0, hop_prob=0.5)
    st = init_lattice(cfg, seed=2)
    n = 400
    st = make_lattice_chunk(cfg, n)(st)
    got = float(msd(st)) / n
    want = cfg.hop_prob * (1 - cfg.density)
    assert abs(got - want) / want < 0.15, (got, want)


def test_merge_creates_dimers():
    cfg = LatticeConfig(height=64, width=64, density=0.2, ass_prob=0.5,
                        diss_prob=0.0)
    st = init_lattice(cfg, seed=3)
    st = make_lattice_chunk(cfg, 100)(st)
    hist = np.asarray(species_histogram(st))
    assert hist[2:].sum() > 0, "no oligomers formed"
    assert int(particle_count(st)) == int(
        sum(k * hist[k] for k in range(1, MAX_SPECIES + 1))
    )


def test_split_reaches_equilibrium():
    cfg = LatticeConfig(height=64, width=64, density=0.15, ass_prob=0.2,
                        diss_prob=0.2)
    st = init_lattice(cfg, seed=4)
    st = make_lattice_chunk(cfg, 300)(st)
    hist = np.asarray(species_histogram(st))
    assert hist[1] > 0 and hist[2] > 0       # coexistence, not absorbing


def test_species_cap():
    cfg = LatticeConfig(height=32, width=32, density=0.5, ass_prob=1.0,
                        diss_prob=0.0)
    st = init_lattice(cfg, seed=5)
    st = make_lattice_chunk(cfg, 200)(st)
    assert int(jnp.max(st.grid)) <= MAX_SPECIES


def test_sharded_matches_unsharded():
    """Threefry is counter-based over the global index: the sharded step
    must produce the bitwise-identical trajectory."""
    from kmc_tpu.parallel.mesh import grid_mesh

    cfg = LatticeConfig(height=64, width=64, density=0.1, ass_prob=0.3,
                        diss_prob=0.1)
    st = init_lattice(cfg, seed=6)
    plain = make_lattice_chunk(cfg, 50)(st)

    mesh = grid_mesh((2, 4))
    sharded_step = make_sharded_lattice_step(cfg, mesh, chunk=50)
    sharded = sharded_step(st)
    np.testing.assert_array_equal(np.asarray(plain.grid),
                                  np.asarray(sharded.grid))
    np.testing.assert_array_equal(np.asarray(plain.disp),
                                  np.asarray(sharded.disp))
