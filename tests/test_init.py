"""Tests for cold-start placement (C7) and the molecule templates."""

import numpy as np
import pytest

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.init import random_init
from kmc_tpu.models.tnfr import ligand_template, receptor_template
from kmc_tpu.state import positions
from kmc_tpu.utils.checks import assert_invariants


def test_receptor_template(ref_cfg):
    t = np.asarray(receptor_template(ref_cfg))
    r = ref_cfg.rb_a_radius
    # bead centers stacked on z axis at 0, 2R, 4R, 6R (main.cpp:301)
    np.testing.assert_allclose(t[:, 0, 2], [0, 2 * r, 4 * r, 6 * r])
    np.testing.assert_allclose(t[:, 0, :2], 0)
    # sites R away from centers along +-x and +z (main.cpp:307-315)
    np.testing.assert_allclose(np.linalg.norm(t[:, 1] - t[:, 0], axis=-1), r)
    np.testing.assert_allclose(t[2, 1] - t[2, 0], [r, 0, 0])
    np.testing.assert_allclose(t[2, 2] - t[2, 0], [-r, 0, 0])
    np.testing.assert_allclose(t[2, 3] - t[2, 0], [0, 0, r])


def test_ligand_template(ref_cfg):
    t = np.asarray(ligand_template(ref_cfg))
    r = ref_cfg.rb_b_radius
    arm = ref_cfg.trimer_arm
    # virtual center at origin, up-site R above it (main.cpp:390-392)
    np.testing.assert_allclose(t[0, 0], 0)
    np.testing.assert_allclose(t[0, 1], [0, 0, r])
    # beads equidistant from center at the trimer arm length (main.cpp:394-402)
    d = np.linalg.norm(t[1:, 0], axis=-1)
    np.testing.assert_allclose(d, arm, rtol=1e-6)
    # outward sites exactly R beyond bead centers, radially (main.cpp:404-412)
    for j in range(1, 4):
        c, s = t[j, 0], t[j, 1]
        np.testing.assert_allclose(np.linalg.norm(s), arm + r, rtol=1e-6)
        np.testing.assert_allclose(np.cross(c, s), 0, atol=1e-4)
    # equilateral: pairwise bead distance = 2R (beads touch)
    for a in range(1, 4):
        for b in range(a + 1, 4):
            np.testing.assert_allclose(
                np.linalg.norm(t[a, 0] - t[b, 0]), 2 * r, rtol=1e-6
            )


def test_random_init_invariants(small_cfg):
    st = random_init(small_cfg, seed=3)
    assert_invariants(st, small_cfg, "after init")

    p = np.asarray(positions(st, small_cfg))
    na = small_cfg.n_a
    # receptors in-plane, inside the box
    assert np.all(np.abs(p[:na, 0, 0, 0]) <= small_cfg.cell_range_x / 2)
    assert np.allclose(p[:na, 0, 0, 2], 0)
    # ligand centers inside z range (main.cpp:359)
    zc = p[na:, 0, 0, 2]
    assert np.all((zc >= 0) & (zc <= small_cfg.cell_range_z))


def test_random_init_seeds_differ(small_cfg):
    a = random_init(small_cfg, seed=0)
    b = random_init(small_cfg, seed=1)
    assert not np.allclose(np.asarray(a.a_xy), np.asarray(b.a_xy))


def test_random_init_reproducible(small_cfg):
    a = random_init(small_cfg, seed=5)
    b = random_init(small_cfg, seed=5)
    np.testing.assert_array_equal(np.asarray(a.a_xy), np.asarray(b.a_xy))
    np.testing.assert_array_equal(np.asarray(a.b_quat), np.asarray(b.b_quat))
