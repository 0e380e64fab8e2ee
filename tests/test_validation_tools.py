"""Round-5 validator surfaces: the receptor-count-per-seeded-cluster
statistic (observables.seeded_receptor_histogram vs the host BFS and vs
the cluster.log parser), flagship-output truncation on resume, and the
NaN-masked band report (state-file migration path)."""

import os
import sys

import numpy as np

from kmc_tpu.engine.clusters import cluster_labels
from kmc_tpu.engine.observables import MAX_HIST_SIZE, seeded_receptor_histogram
from kmc_tpu.io.writers import EnsembleOutputSet, append_cluster_log, bfs_clusters
from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk_hist

from helpers import ideal_cis_pair, ideal_trans_pair, spread_state

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def _bonded_state(cfg):
    """A state with a 2-receptor complex, a 1-receptor complex, a cis-only
    receptor pair (NOT ligand-seeded) and free molecules."""
    st = spread_state(cfg, 3)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg,
                          center_xy=(-600.0, -600.0), alpha=0.3, bond=True)
    st = ideal_trans_pair(st, a=1, b=0, site=2, cfg=cfg,
                          center_xy=(-600.0, -600.0), alpha=0.3, bond=True)
    st = ideal_trans_pair(st, a=2, b=1, site=1, cfg=cfg,
                          center_xy=(600.0, 600.0), alpha=1.1, bond=True)
    st = ideal_cis_pair(st, a1=4, a2=5, cfg=cfg, xy=(0.0, 650.0), bond=True)
    return st


def test_seeded_receptor_histogram_matches_host_bfs(small_cfg):
    """Device histogram == receptor counts of the host BFS rows (the
    statistic the validator parses from a reference cluster.log)."""
    cfg = small_cfg
    st = _bonded_state(cfg)
    info = cluster_labels(st, cfg)
    dev = np.asarray(seeded_receptor_histogram(info, cfg))

    host = np.zeros(MAX_HIST_SIZE + 1, dtype=np.int64)
    for row in bfs_clusters(st, cfg):
        if row:                                   # one row per seeded cluster
            n_rec = sum(1 for m in row if m <= cfg.n_a)
            host[min(n_rec, MAX_HIST_SIZE)] += 1
    np.testing.assert_array_equal(dev, host)
    # the fixture has a 2-receptor and a 1-receptor seeded cluster, and
    # free ligands as 0-receptor rows; the cis-only pair is NOT seeded
    assert dev[2] == 1 and dev[1] == 1
    assert dev[0] == cfg.n_b - 2                  # free ligands


def test_cluster_log_receptor_parser_roundtrip(tmp_path, small_cfg):
    """write cluster.log via the host writer, parse it back with the
    validator's receptor parser: per-frame histograms must equal the
    device statistic."""
    from validate_vs_reference import read_cluster_log_receptors

    cfg = small_cfg
    st = _bonded_state(cfg)
    path = os.path.join(tmp_path, "cluster.log")
    append_cluster_log(path, st, cfg)
    _, hists = read_cluster_log_receptors(path, cfg.n_a, MAX_HIST_SIZE)
    info = cluster_labels(st, cfg)
    dev = np.asarray(seeded_receptor_histogram(info, cfg))
    np.testing.assert_array_equal(hists[0], dev)


def test_truncate_outputs_closes_resume_race(tmp_path, small_cfg):
    """Write 3 outputs, truncate to 2: every flagship file must hold
    exactly 2 output rows/frames afterwards (ADVICE r4 resume race)."""
    from validate_vs_reference import truncate_outputs

    cfg = small_cfg
    out = os.path.join(tmp_path, "flag")
    writer = EnsembleOutputSet(out, cfg, fresh=True)
    chunk = make_ensemble_chunk_hist(cfg, 5, donate=False)
    state = init_ensemble(cfg, 4, seed=0)
    for _ in range(3):
        state, (obs, hist, ahist) = chunk(state)
        writer(state, obs)
    writer.close()

    truncate_outputs(out, cfg, 2)
    assert len(open(os.path.join(out, "bond.dat")).readlines()) == 2
    assert len(open(os.path.join(out, "bond_ens.dat")).readlines()) == 3
    gro = open(os.path.join(out, "test.gro")).read().splitlines()
    assert sum(1 for l in gro if l.startswith("Hello Gro!")) == 2
    natoms = cfg.n_a * 4 + cfg.n_b * 3
    assert len(gro) == 2 * (natoms + 3)
    cl = open(os.path.join(out, "cluster.log")).read().splitlines()
    assert sum(1 for l in cl if l.startswith("Hello Cluster!")) == 2
    assert len(cl) == 2 * (cfg.n_b + 1)


def test_kinetics_report_masks_nan_rows():
    """Columns resumed from a pre-r5 state file carry NaN for old rows:
    coverage/binomial stats must use only the valid suffix (n_valid)."""
    from validate_vs_reference import KIN_COLS, _kinetics_report

    rng = np.random.default_rng(0)
    n, reps = 40, 32
    ref = np.zeros((n, 7))
    kin = {}
    for ci, c in enumerate(KIN_COLS):
        samples = rng.normal(10.0, 2.0, size=(n, reps))
        ref[:, 1 + ci] = 10.0
        if c == "max_complex":                   # half the rows are legacy
            samples[: n // 2] = np.nan
        kin[c] = samples

    class A:
        replicas = reps
        quantile = 0.995
        min_coverage = 0.9

    rep = _kinetics_report(kin, ref, A)
    assert rep["columns"]["max_complex"]["n_valid"] == n // 2
    assert rep["columns"]["bond_rl"]["n_valid"] == n
    assert rep["ok"] is True

    # all-NaN column: reported as n_valid 0 / ok None, not a crash
    kin["max_complex"][:] = np.nan
    rep = _kinetics_report(kin, ref, A)
    assert rep["columns"]["max_complex"] == {"n_valid": 0, "ok": None}
