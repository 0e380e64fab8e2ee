"""The fused Pallas kernel must reproduce the XLA lattice step bitwise
(same counter-hash streams; interpret mode on CPU)."""

import numpy as np

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import init_lattice, particle_count
from kmc_tpu.lattice.step import make_lattice_step
from kmc_tpu.ops.pallas_lattice import make_pallas_lattice_step


def test_pallas_matches_xla_step():
    cfg = LatticeConfig(height=64, width=64, density=0.15, ass_prob=0.3,
                        diss_prob=0.1)
    st = init_lattice(cfg, seed=13)
    xla = make_lattice_step(cfg)
    pls = make_pallas_lattice_step(cfg, interpret=True)
    a, b = st, st
    for _ in range(20):
        a = xla(a)
        b = pls(b)
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))
    np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))
    assert int(particle_count(b)) == int(particle_count(st))


def test_tiled_pallas_matches_xla_step():
    """The VMEM-tiled invocation (wrap ghosts + per-tile global origins)
    must stay bitwise identical — the form actually used on hardware (the
    whole-grid kernel exceeds v5e VMEM at 256^2)."""
    import functools

    import jax

    from kmc_tpu.ops.pallas_lattice import pallas_lattice_step

    cfg = LatticeConfig(height=64, width=64, density=0.15, ass_prob=0.3,
                        diss_prob=0.1)
    st = init_lattice(cfg, seed=7)
    xla = make_lattice_step(cfg)
    pls = jax.jit(functools.partial(pallas_lattice_step, cfg=cfg,
                                    interpret=True, tile=(16, 16)))
    a, b = st, st
    for _ in range(20):
        a = xla(a)
        b = pls(b)
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))
    np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))


def test_tiled_pallas_non_multiple_size_falls_back():
    """Grid sizes > tile but not a multiple of it (e.g. 48 with 32-tiles)
    must fall back to the largest divisor tile instead of failing at trace
    time (ADVICE r3) — and stay bitwise identical to XLA."""
    import functools

    import jax

    from kmc_tpu.ops.pallas_lattice import pallas_lattice_step

    cfg = LatticeConfig(height=48, width=48, density=0.15, ass_prob=0.3,
                        diss_prob=0.1)
    st = init_lattice(cfg, seed=3)
    xla = make_lattice_step(cfg)
    pls = jax.jit(functools.partial(pallas_lattice_step, cfg=cfg,
                                    interpret=True, tile=(32, 32)))
    a, b = st, st
    for _ in range(6):
        a = xla(a)
        b = pls(b)
    np.testing.assert_array_equal(np.asarray(a.grid), np.asarray(b.grid))
    np.testing.assert_array_equal(np.asarray(a.disp), np.asarray(b.disp))
