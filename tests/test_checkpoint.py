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


def test_load_real_reference_cpt(ref_cfg):
    """Interop proof (C6): a position.cpt written by the COMPILED REFERENCE
    binary (main.cpp:2206-2244; snapshot at step 1,425,000 of a long golden
    run) loads with exactly-matching topology and counters, and every bead
    coordinate reproduced from poses within the %.3f rounding bound — up to
    the reference's own lay-down bead-relabel chirality (see
    load_reference_cpt)."""
    import jax.numpy as jnp

    from kmc_tpu.engine.observables import bond_counters

    path = os.path.join(os.path.dirname(__file__), "data", "ref_position.cpt")
    cfg = ref_cfg
    st = load_reference_cpt(path, cfg)

    toks = open(path).read().split()
    total, rl, cis, mono, maxc, step = map(int, toks[-6:])
    d_rl, d_mono, d_cis, d_total = (int(x) for x in bond_counters(st, cfg))
    assert (d_rl, d_mono, d_cis, d_total) == (rl, mono, cis, total)
    assert int(st.max_complex) == maxc
    assert int(st.step) == step + 1                  # main.cpp:267 (+1)

    # coordinate fidelity: re-derive all bead coordinates from poses and
    # compare to the file's, allowing the beads-3<->4 relabel per ligand
    p = np.asarray(positions(st, cfg))
    it = iter(toks)
    na, nb = cfg.n_a, cfg.n_b
    ref_a = np.zeros((na, 4, 4, 3))
    for i in range(na):
        for j in range(4):
            for k in range(4):
                ref_a[i, j, k] = [float(next(it)) for _ in range(3)]
        for _ in range(5):
            next(it)
    ref_b = np.zeros((nb, 4, 2, 3))
    for b in range(nb):
        for j in range(4):
            for k in range(2):
                ref_b[b, j, k] = [float(next(it)) for _ in range(3)]
            next(it), next(it)
    assert np.max(np.abs(p[:na, :, :4] - ref_a)) < 0.01
    direct = np.abs(p[na:, :, :2] - ref_b).max(axis=(1, 2, 3))
    relabeled = np.abs(p[na:, :, :2] - ref_b[:, [0, 1, 3, 2]]).max(
        axis=(1, 2, 3)
    )
    assert np.max(np.minimum(direct, relabeled)) < 0.01
    assert_invariants(st, cfg, "after real reference cpt load")

    # and the loaded state steps without NaNs
    st2, _ = make_step_fn(cfg)(st)
    assert np.isfinite(np.asarray(st2.a_xy)).all()
    assert np.isfinite(np.asarray(st2.b_center)).all()


def test_mirrored_ligand_relabel(tmp_path, small_cfg):
    """A cpt whose free ligand is an IMPROPER rotation of the template (the
    reference's laid-then-dissociated chirality, main.cpp:1145-1190) loads
    as the beads-3<->4 relabel with partner slots carried along."""
    cfg = small_cfg
    st = spread_state(cfg, 4)
    p = os.path.join(tmp_path, "position.cpt")
    save_reference_cpt(p, st, cfg)

    # mirror ligand 0's beads through the template x=0 plane: swap the two
    # coordinate lines of beads 3 and 4 (rows are '%10.3f'*3 triplets)
    lines = open(p).read().splitlines()
    first_b = cfg.n_a * 17                           # 16 coord + 1 topo rows
    # ligand block rows: (bead j coords k=1,2; then status row) x 4
    i3 = first_b + 2 * 3                             # bead 3 starts (j=2)
    i4 = first_b + 3 * 3
    lines[i3], lines[i4] = lines[i4], lines[i3]
    lines[i3 + 1], lines[i4 + 1] = lines[i4 + 1], lines[i3 + 1]
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")

    st2 = load_reference_cpt(p, cfg)
    pa = np.asarray(positions(st, cfg))
    pb = np.asarray(positions(st2, cfg))
    # loader restores the ORIGINAL bead assignment (mirror + relabel = id)
    assert np.max(np.abs(pa[cfg.n_a] - pb[cfg.n_a])) < 0.05
    np.testing.assert_array_equal(
        np.asarray(st.b_partner), np.asarray(st2.b_partner)
    )


def test_mirrored_bound_ligand_relabel(tmp_path, small_cfg):
    """A reference-consistent MIRRORED cpt with a trans bond on the ligand
    (bond recorded on file-bead 4, receptor seated at that bead's physical
    site) must load with the partner slot AND the receptor's a_site remapped
    together — topology_mutual intact and the seat geometry unchanged
    (ADVICE r2: the carried-partner-slot path)."""
    cfg = small_cfg
    st = spread_state(cfg, 4)
    # A0 bound to B0 at our site 2 (= slot 1 = reference bead 3)
    st = ideal_trans_pair(st, a=0, b=0, site=2, cfg=cfg,
                          center_xy=(300.0, 300.0), bond=True)
    p = os.path.join(tmp_path, "position.cpt")
    save_reference_cpt(p, st, cfg)

    lines = open(p).read().splitlines()
    first_b = cfg.n_a * 17
    # mirror ligand 0 the way the reference's lay-down chirality does:
    # swap the ENTIRE bead-3 and bead-4 blocks (2 coord rows + status row),
    # so the physical bound bead keeps its bond but is now LABELED bead 4
    i3, i4 = first_b + 2 * 3, first_b + 3 * 3
    for o in range(3):
        lines[i3 + o], lines[i4 + o] = lines[i4 + o], lines[i3 + o]
    # ...and the receptor's own row must point at the new label (nei4 3->4)
    topo = lines[16].split()
    assert topo[3] == "3"
    lines[16] = f"{int(topo[0]):>8}{int(topo[1]):>8}{int(topo[2]):>8}" \
                f"{4:>8}{int(topo[4]):>8}"
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")

    st2 = load_reference_cpt(p, cfg)
    # physical geometry is restored exactly (mirror + relabel = identity)
    pa = np.asarray(positions(st, cfg))
    pb = np.asarray(positions(st2, cfg))
    assert np.max(np.abs(pa - pb)) < 0.05
    # topology: back to the canonical labeling, mutual and seat-consistent
    assert int(st2.a_site[0]) == 2
    assert int(st2.b_partner[0, 1]) == 0
    assert int(st2.b_partner[0, 2]) == -1
    np.testing.assert_array_equal(np.asarray(st.a_trans),
                                  np.asarray(st2.a_trans))
    assert_invariants(st2, cfg, "after mirrored bound cpt load")


def test_cpt_counters_block(tmp_path, small_cfg):
    cfg = small_cfg
    st = _evolved_state(cfg, n=5)
    p = os.path.join(tmp_path, "position.cpt")
    save_reference_cpt(p, st, cfg)
    tail = open(p).read().split()[-6:]
    total, rl, cis, mono, maxc, step = map(int, tail)
    assert total == rl + cis + mono
    assert step == int(st.step) - 1
