"""Tests for checkpoint/resume (C6/C21): native bitwise round trip and the
reference-compatible position.cpt text round trip."""

import os

import numpy as np

import jax

from kmc_tpu.engine.step import make_step_fn
from kmc_tpu.io.checkpoint import (
    load_native,
    load_reference_cpt,
    save_native,
    save_reference_cpt,
)
from kmc_tpu.state import positions
from kmc_tpu.utils.checks import assert_invariants

from helpers import ideal_cis_pair, ideal_trans_pair, spread_state


def _evolved_state(cfg, n=30):
    from kmc_tpu.engine.step import make_chunk_fn

    st = spread_state(cfg, 2)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    st = ideal_cis_pair(st, 5, 6, cfg, xy=(400.0, -200.0), bond=True)
    st, _ = make_chunk_fn(cfg, n)(st)
    return st


def test_native_roundtrip(tmp_path, small_cfg):
    cfg = small_cfg
    st = _evolved_state(cfg)
    p = os.path.join(tmp_path, "ckpt.npz")
    save_native(p, st)
    st2 = load_native(p)
    for f in st._fields:
        if f == "key":
            np.testing.assert_array_equal(
                np.asarray(jax.random.key_data(st.key)),
                np.asarray(jax.random.key_data(st2.key)),
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(getattr(st, f)), np.asarray(getattr(st2, f)), err_msg=f
            )
    # resumed run continues identically
    step = make_step_fn(cfg)
    a1, _ = step(st)
    a2, _ = step(st2)
    np.testing.assert_array_equal(np.asarray(a1.a_xy), np.asarray(a2.a_xy))


def test_reference_cpt_roundtrip(tmp_path, small_cfg):
    cfg = small_cfg
    st = _evolved_state(cfg)
    p = os.path.join(tmp_path, "position.cpt")
    save_reference_cpt(p, st, cfg)
    st2 = load_reference_cpt(p, cfg)

    # topology is exact
    np.testing.assert_array_equal(np.asarray(st.a_trans), np.asarray(st2.a_trans))
    np.testing.assert_array_equal(np.asarray(st.a_site), np.asarray(st2.a_site))
    np.testing.assert_array_equal(np.asarray(st.a_cis), np.asarray(st2.a_cis))
    np.testing.assert_array_equal(
        np.asarray(st.b_partner), np.asarray(st2.b_partner)
    )
    np.testing.assert_array_equal(np.asarray(st.b_laid), np.asarray(st2.b_laid))
    assert int(st2.step) == int(st.step)          # saved step-1, +1 on load
    assert int(st2.max_complex) == int(st.max_complex)

    # coordinates within the reference's own %.3f resume bound (SURVEY §3.5)
    pa = np.asarray(positions(st, cfg))
    pb = np.asarray(positions(st2, cfg))
    assert np.max(np.abs(pa - pb)) < 0.05
    assert_invariants(st2, cfg, "after cpt resume")


def test_cpt_counters_block(tmp_path, small_cfg):
    cfg = small_cfg
    st = _evolved_state(cfg, n=5)
    p = os.path.join(tmp_path, "position.cpt")
    save_reference_cpt(p, st, cfg)
    tail = open(p).read().split()[-6:]
    total, rl, cis, mono, maxc, step = map(int, tail)
    assert total == rl + cis + mono
    assert step == int(st.step) - 1
