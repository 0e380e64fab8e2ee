"""The native (C++) formatters must reproduce the Python writers byte-wise,
and the async writer must persist everything it was handed."""

import os

import numpy as np
import pytest

from kmc_tpu.engine.observables import bond_counters
from kmc_tpu.io import native
from kmc_tpu.io.checkpoint import save_reference_cpt
from kmc_tpu.io.writers import append_gro_frame
from kmc_tpu.state import positions

from helpers import ideal_trans_pair, spread_state

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _topology_arrays(st, cfg):
    a_trans = np.asarray(st.a_trans)
    a_site = np.asarray(st.a_site)
    a_cis = np.asarray(st.a_cis)
    b_partner = np.asarray(st.b_partner)
    a_top = np.zeros((cfg.n_a, 5), np.int32)
    a_top[:, 0] = (a_trans >= 0).astype(np.int32)
    a_top[:, 1] = (a_cis >= 0).astype(np.int32)
    a_top[:, 2] = np.where(a_trans >= 0, a_trans + 1, 0)
    a_top[:, 3] = np.where(a_site >= 0, a_site + 1, 0)
    a_top[:, 4] = np.where(a_cis >= 0, a_cis + 1, 0)
    b_top = np.zeros((cfg.n_b, 4, 2), np.int32)
    b_top[:, 1:, 0] = (b_partner >= 0).astype(np.int32)
    b_top[:, 1:, 1] = np.where(b_partner >= 0, b_partner + 1, 0)
    return a_top, b_top


def test_native_gro_matches_python(tmp_path, small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    py_path = os.path.join(tmp_path, "py.gro")
    append_gro_frame(py_path, st, cfg)
    want = open(py_path, "rb").read()

    pos = np.asarray(positions(st, cfg))
    t = (int(st.step) - 1) * cfg.time_step
    got = native.format_gro(pos, cfg.n_a, cfg.n_b, t,
                            (cfg.cell_range_x, cfg.cell_range_y,
                             cfg.cell_range_z))
    assert got == want


def test_native_cpt_matches_python(tmp_path, small_cfg):
    cfg = small_cfg
    st = ideal_trans_pair(spread_state(cfg, 0), a=0, b=0, site=1, cfg=cfg,
                          bond=True)
    py_path = os.path.join(tmp_path, "py.cpt")
    save_reference_cpt(py_path, st, cfg)
    want = open(py_path, "rb").read()

    pos = np.asarray(positions(st, cfg))
    a_top, b_top = _topology_arrays(st, cfg)
    rl, mono, cis, total = (int(x) for x in bond_counters(st, cfg))
    got = native.format_cpt(
        pos, a_top, b_top,
        (total, rl, cis, mono, int(st.max_complex), int(st.step) - 1),
        cfg.n_a, cfg.n_b,
    )
    assert got == want


def test_async_writer_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "stream.txt")
    chunks = [f"line {i}\n".encode() for i in range(200)]
    with native.AsyncWriter(p) as w:
        for c in chunks:
            w.append(c)
    assert open(p, "rb").read() == b"".join(chunks)
