"""Anchor-continuation machinery (VERDICT r3 #1: validate the late horizon
by continuing a reference checkpoint as an ensemble)."""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu.io.checkpoint import save_reference_cpt, load_reference_cpt
from kmc_tpu.parallel.ensemble import (broadcast_ensemble, init_ensemble,
                                       make_ensemble_chunk)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_broadcast_ensemble_diverges(small_cfg, tmp_path):
    """All replicas start at the identical configuration (bitwise), with
    independent streams: after a few steps the trajectories differ."""
    cfg = small_cfg.replace(out_every=10)
    base = init_ensemble(cfg, 1, seed=3)
    st0 = jax.tree.map(lambda x: x[0], base)
    # round-trip through the reference text format like the real flow
    p = str(tmp_path / "position.cpt")
    save_reference_cpt(p, st0, cfg)
    anchor = load_reference_cpt(p, cfg)

    ens = broadcast_ensemble(anchor, 4, seed=7)
    for f in ("a_xy", "b_center", "a_trans", "a_cis", "step"):
        v = np.asarray(getattr(ens, f))
        for r in range(1, 4):
            np.testing.assert_array_equal(v[r], v[0])

    chunk = make_ensemble_chunk(cfg, 10, donate=False)
    out, _ = chunk(ens)
    xy = np.asarray(out.a_xy)
    assert not np.allclose(xy[0], xy[1])          # streams independent
    assert int(np.asarray(out.step)[0]) == int(anchor.step) + 10


def test_validator_anchor_row_skip(tmp_path):
    """cmd_kinetics' anchor slicing: rows at or before the cpt's saved step
    time are skipped; comparison starts at the next oracle row."""
    import validate_vs_reference as vv

    rows = np.array([[5000.0 * (k + 1) * 10.0, 1, 2, 3, 6, 0.0, 1]
                     for k in range(8)])
    anchor_step = 3 * 5000                          # saved at row 3's step
    anchor_t = anchor_step * 10.0
    skip = int(np.sum(rows[:, 0] <= anchor_t + 1e-6))
    assert skip == 3
    assert rows[skip, 0] == anchor_t + 50000.0
