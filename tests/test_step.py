"""Integration tests: full steps, invariants under load, run() driver, and
reaction kinetics actually progressing at boosted rates."""

import numpy as np

from kmc_tpu.engine.step import make_chunk_fn, make_step_fn, run
from kmc_tpu.state import init_state
from kmc_tpu.utils.checks import assert_invariants

from helpers import spread_state


def test_invariants_under_load(small_cfg):
    """Dense box + boosted association rates: bonds form, complexes build,
    and every invariant holds throughout."""
    # boosted rates AND widened geometric gates: bond formation within a few
    # hundred steps must not hinge on RNG-stream luck (the tight reference
    # gates make encounters rare events at test scale)
    cfg = small_cfg.replace(
        cell_range_x=800.0,
        cell_range_y=800.0,
        cell_range_z=300.0,
        ass_rate=0.5,
        mono_cis_ass_rate=0.2,
        cis_ass_rate=0.2,
        diss_rate=1e-3,
        bond_dist_cutoff=30.0,
        bond_thetapd_cutoff=90.0,
        bond_thetaot_cutoff=170.0,
        cis_dist_cutoff=25.0,
        cis_thetaot_cutoff=60.0,
    )
    st = spread_state(cfg, 4)
    chunk = make_chunk_fn(cfg, 50)
    saw_bond = saw_rl = False
    for i in range(8):
        st, obs = chunk(st)
        assert_invariants(st, cfg, f"at step {int(st.step)}")
        saw_bond = saw_bond or int(obs.bond_num) > 0
        saw_rl = saw_rl or int(obs.bond_rl) > 0
    assert saw_bond, "no bond ever formed in a dense boosted run"
    if saw_rl:
        # a receptor-ligand bond implies a ligand-seeded cluster of >= 2
        assert int(st.max_complex) >= 2


def test_chunk_fn_matches_step_fn(small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    step = make_step_fn(cfg)
    chunk = make_chunk_fn(cfg, 10)
    s1 = st
    for _ in range(10):
        s1, o1 = step(s1)
    s2, o2 = chunk(st)
    np.testing.assert_allclose(np.asarray(s1.a_xy), np.asarray(s2.a_xy),
                               atol=1e-4)
    assert int(s1.step) == int(s2.step)
    assert float(o1.time_ns) == float(o2.time_ns)


def test_run_driver_outputs(small_cfg):
    cfg = small_cfg.replace(out_every=20)
    st = init_state(cfg, 0)
    seen = []
    st = run(st, cfg, n_steps=60, on_output=lambda s, o: seen.append(float(o.time_ns)))
    assert seen == [200.0, 400.0, 600.0]
    assert int(st.step) == 61


def test_max_complex_tracks_ligand_clusters(small_cfg):
    from helpers import ideal_trans_pair

    cfg = small_cfg
    st = ideal_trans_pair(spread_state(cfg, 0), a=0, b=0, site=1, cfg=cfg,
                          bond=True)
    step = make_step_fn(cfg)
    st, obs = step(st)
    assert int(st.max_complex) == 2
    assert float(obs.cluster_size) == 2.0


def test_observables_fields(small_cfg):
    st = spread_state(small_cfg, 0)
    step = make_step_fn(small_cfg)
    st, obs = step(st)
    assert float(obs.time_ns) == small_cfg.time_step
    assert int(obs.bond_num) == 0
    assert float(obs.cluster_size) == 0.0


def test_run_driver_tail_masked_chunk(small_cfg):
    """A non-multiple-of-out_every tail runs through the ONE fixed-shape
    masked chunk (no per-tail-length compiles) and reproduces the exact
    trajectory of plain stepping (RNG is keyed by state.step)."""
    cfg = small_cfg.replace(out_every=20)
    st0 = init_state(cfg, 3)
    seen = []
    st = run(st0, cfg, n_steps=50,
             on_output=lambda s, o: seen.append(float(o.time_ns)))
    assert seen == [200.0, 400.0, 500.0]
    assert int(st.step) == 51

    # trajectory equivalence vs plain stepping
    ref = st0
    step1 = make_step_fn(cfg)
    for _ in range(50):
        ref, _ = step1(ref)
    np.testing.assert_allclose(np.asarray(st.a_xy), np.asarray(ref.a_xy),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(st.a_trans),
                                  np.asarray(ref.a_trans))
