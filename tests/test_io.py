"""Tests for the reference-compatible file writers (C5, C22-C24)."""

import os

import numpy as np

from kmc_tpu.engine.clusters import cluster_labels
from kmc_tpu.engine.observables import observe
from kmc_tpu.engine.step import make_step_fn, run
from kmc_tpu.io.writers import (
    OutputSet,
    append_bond_dat,
    append_gro_frame,
    bfs_clusters,
    write_parameter_log,
)
from kmc_tpu.state import init_state

from helpers import ideal_trans_pair, spread_state


def test_bond_dat_columns(tmp_path, small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    step = make_step_fn(cfg)
    st, obs = step(st)
    p = os.path.join(tmp_path, "bond.dat")
    append_bond_dat(p, obs)
    line = open(p).read().rstrip("\n")
    cols = line.split()
    assert len(cols) == 7
    assert float(cols[0]) == cfg.time_step            # t in ns
    assert cols[1] == "0" and cols[4] == "0"
    # fixed widths like the reference (main.cpp:2251)
    assert line[:15].strip() == cols[0]


def test_gro_frame_shape(tmp_path, small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    p = os.path.join(tmp_path, "test.gro")
    append_gro_frame(p, st, cfg)
    lines = open(p).read().splitlines()
    natoms = cfg.n_a * 4 + cfg.n_b * 3
    assert lines[0].startswith("Hello Gro!")
    assert int(lines[1]) == natoms
    assert len(lines) == natoms + 3
    assert "ALA" in lines[2] and "LEU" in lines[2 + cfg.n_a * 4]
    # box footer in nm
    box = [float(x) for x in lines[-1].split()]
    assert box[0] == cfg.cell_range_x / 10


def test_bfs_clusters_matches_labels(small_cfg):
    cfg = small_cfg
    st = ideal_trans_pair(spread_state(cfg, 0), a=3, b=2, site=1, cfg=cfg,
                          bond=True)
    rows = bfs_clusters(st, cfg)
    # seed order: ligand 0,1 free singletons; ligand 2 seeds {B2, A3}
    assert rows[0] == [cfg.n_a + 1]
    assert rows[2] == [cfg.n_a + 3, 4]                # 1-based, BFS order
    info = cluster_labels(st, cfg)
    assert int(info.size[3]) == 2


def test_output_set_end_to_end(tmp_path, small_cfg):
    cfg = small_cfg.replace(out_every=10)
    st = init_state(cfg, 0)
    outs = OutputSet(str(tmp_path), cfg)
    st = run(st, cfg, n_steps=30, on_output=outs)
    assert len(open(outs.bond).read().splitlines()) == 3
    assert os.path.getsize(outs.gro) > 0
    assert os.path.getsize(outs.cpt) > 0
    assert open(os.path.join(tmp_path, "parameter.log")).read().count(
        "protein_A_tot_num"
    ) == 1
    # resume from the written cpt reproduces topology
    from kmc_tpu.io.checkpoint import load_reference_cpt

    st2 = load_reference_cpt(outs.cpt, cfg)
    assert int(st2.step) == int(st.step)
    np.testing.assert_array_equal(np.asarray(st.a_trans), np.asarray(st2.a_trans))
