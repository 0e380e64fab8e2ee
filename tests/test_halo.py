"""Tests for explicit shard_map+ppermute halo exchange vs the implicit
sharded-roll path and the single-device trajectory (SURVEY.md §4:
multi-host semantics validated on the 8-device virtual CPU platform)."""

import numpy as np

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import init_lattice, particle_count
from kmc_tpu.lattice.step import make_lattice_chunk, make_lattice_step
from kmc_tpu.parallel.halo import make_halo_lattice_step
from kmc_tpu.parallel.mesh import grid_mesh


def test_halo_step_matches_single_device():
    cfg = LatticeConfig(height=64, width=64, density=0.12, ass_prob=0.25,
                        diss_prob=0.08)
    st0 = init_lattice(cfg, seed=9)

    single = make_lattice_step(cfg)
    mesh = grid_mesh((2, 4))
    halo = make_halo_lattice_step(cfg, mesh)

    a, b = st0, st0
    for _ in range(30):
        a = single(a)
        b = halo(b)
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))
    np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))
    assert int(particle_count(b)) == int(particle_count(st0))


def test_halo_pallas_matches_plain_halo():
    """shard_map + per-device Pallas kernel == shard_map + jnp local step
    (and hence == single device), bitwise."""
    from kmc_tpu.parallel.halo import make_halo_pallas_step

    cfg = LatticeConfig(height=64, width=64, density=0.12, ass_prob=0.25,
                        diss_prob=0.08)
    st0 = init_lattice(cfg, seed=21)
    mesh = grid_mesh((2, 4))
    plain = make_halo_lattice_step(cfg, mesh)
    fused = make_halo_pallas_step(cfg, mesh, interpret=True)
    a, b = st0, st0
    for _ in range(12):
        a = plain(a)
        b = fused(b)
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))
    np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))


def test_halo_on_2x2_mesh():
    import jax

    cfg = LatticeConfig(height=32, width=32, density=0.1)
    st0 = init_lattice(cfg, seed=11)
    mesh = grid_mesh((2, 2), devices=jax.devices()[:4])
    halo = make_halo_lattice_step(cfg, mesh)
    chunked = make_lattice_chunk(cfg, 10)
    a = chunked(st0)
    b = st0
    for _ in range(10):
        b = halo(b)
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))
