"""Tests for the idealization pass (C13-C14) against the reference's ideal
bond frames (main.cpp:1215, 1255, 1439: AreSame target distances)."""

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu import rng
from kmc_tpu.engine.align import idealize
from kmc_tpu.engine.clusters import cluster_labels
from kmc_tpu.state import positions
from kmc_tpu.utils.checks import assert_invariants

from helpers import ideal_cis_pair, ideal_trans_pair, spread_state


def _idealize(st, cfg, step=7):
    info = cluster_labels(st, cfg)
    skey = rng.stream_key(rng.step_key(st.key, step), rng.STREAM_ALIGN)
    return jax.jit(idealize, static_argnums=3)(st, info, skey, cfg)


def _trans_frame_errors(st, cfg, a, b, site):
    p = np.asarray(positions(st, cfg))
    na = cfg.n_a
    asite = p[a, 2, 1]
    acenter = p[a, 2, 0]
    bsite = p[na + b, site, 1]
    bbead = p[na + b, site, 0]
    # reference AreSame targets (main.cpp:1215):
    d_site = np.linalg.norm(bsite[:2] - asite[:2])
    d_center = np.linalg.norm(bbead[:2] - acenter[:2])
    return (
        abs(d_site - cfg.bond_dist_cutoff / 2),
        abs(d_center - (cfg.bond_dist_cutoff / 2 + cfg.rb_a_radius + cfg.rb_b_radius)),
    )


def test_loose_trans_bond_snaps(small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    # perturb the receptor: loose but bonded geometry (as right after a
    # gate-accepted association)
    st = st._replace(
        a_xy=st.a_xy.at[0].add(jnp.asarray([4.0, -3.0])),
        a_psi=st.a_psi.at[0].add(0.3),
    )
    e1, e2 = _trans_frame_errors(st, cfg, 0, 0, 1)
    assert e1 > 1.0                                  # really perturbed
    out = _idealize(st, cfg)
    e1, e2 = _trans_frame_errors(out, cfg, 0, 0, 1)
    assert e1 < 1e-2 and e2 < 1e-2
    assert_invariants(out, cfg, "after trans snap")


def test_unlaid_ligand_lays_down(small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    na = cfg.n_a
    # tilt the ligand out of plane and unset laid (fresh binding of a free B)
    from kmc_tpu.geometry import quat_from_euler, quat_mul

    st = st._replace(
        b_quat=st.b_quat.at[0].set(
            quat_mul(quat_from_euler(0.4, 0.2, 0.1), st.b_quat[0])
        ),
        b_laid=st.b_laid.at[0].set(False),
        b_center=st.b_center.at[0, 2].add(17.0),
    )
    out = _idealize(st, cfg)
    assert bool(out.b_laid[0])
    p = np.asarray(positions(out, cfg))
    # all ligand bead centers in the lay-down plane (main.cpp:1145-1150)
    np.testing.assert_allclose(p[na, 1:, 0, 2], cfg.plane_z, atol=1e-3)
    np.testing.assert_allclose(p[na, 0, 1, 2], cfg.plane_z + cfg.rb_b_radius,
                               atol=1e-3)
    # the bonded receptor ends in ideal frame
    e1, e2 = _trans_frame_errors(out, cfg, 0, 0, 1)
    assert e1 < 1e-2


def test_cis_pair_snaps(small_cfg):
    cfg = small_cfg
    st = ideal_cis_pair(spread_state(cfg, 0), 0, 1, cfg, bond=True)
    st = st._replace(a_xy=st.a_xy.at[1].add(jnp.asarray([3.0, 2.0])))
    out = _idealize(st, cfg)
    p = np.asarray(positions(out, cfg))
    d_site = np.linalg.norm(p[0, 2, 2, :2] - p[1, 2, 2, :2])
    d_center = np.linalg.norm(p[0, 2, 0, :2] - p[1, 2, 0, :2])
    # reference AreSame targets (main.cpp:780-781)
    assert abs(d_site - cfg.cis_dist_cutoff / 2) < 1e-2
    assert abs(d_center - (cfg.cis_dist_cutoff / 2 + 2 * cfg.rb_a_radius)) < 1e-2


def test_ideal_cluster_is_fixed_point(small_cfg):
    cfg = small_cfg
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    out1 = _idealize(st, cfg, step=11)
    out2 = _idealize(out1, cfg, step=12)
    np.testing.assert_allclose(np.asarray(out1.a_xy), np.asarray(out2.a_xy),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out1.b_center),
                               np.asarray(out2.b_center), atol=1e-3)


def test_merged_complex_layout(small_cfg):
    """Trimer: B0 with A0 (site1), A0 cis A1, A1 bound to B1 (site 2) —
    after idealization every bond frame is ideal simultaneously."""
    cfg = small_cfg
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    # create the cis bond at loose geometry: A1 roughly beyond A0
    st = ideal_cis_pair(st, 0, 1, cfg)      # overwrites A0? no: keeps pose
    # restore A0's pose from the trans frame by rebuilding:
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    import numpy as _np

    ux = _np.array([_np.cos(float(st.a_psi[0])), _np.sin(float(st.a_psi[0]))])
    a1_xy = _np.asarray(st.a_xy[0]) - ux * (2 * cfg.rb_a_radius + 9.0)
    st = st._replace(
        a_xy=st.a_xy.at[1].set(jnp.asarray(a1_xy)),
        a_psi=st.a_psi.at[1].set(st.a_psi[0] + jnp.pi + 0.05),
        a_cis=st.a_cis.at[0].set(1).at[1].set(0),
    )
    # bind A1 to ligand B1 loosely nearby
    na = cfg.n_a
    st = st._replace(
        b_center=st.b_center.at[1].set(
            jnp.asarray([a1_xy[0] - 120.0, a1_xy[1], cfg.plane_z])
        ),
        b_laid=st.b_laid.at[1].set(True),
        a_trans=st.a_trans.at[1].set(na + 1),
        a_site=st.a_site.at[1].set(2),
        b_partner=st.b_partner.at[1, 1].set(1),
    )
    out = _idealize(st, cfg)
    e1, e2 = _trans_frame_errors(out, cfg, 0, 0, 1)
    f1, f2 = _trans_frame_errors(out, cfg, 1, 1, 2)
    p = np.asarray(positions(out, cfg))
    d_cis = np.linalg.norm(p[0, 2, 2, :2] - p[1, 2, 2, :2])
    assert e1 < 1e-2 and f1 < 1e-2
    assert abs(d_cis - cfg.cis_dist_cutoff / 2) < 1e-2
    # frozen complex bookkeeping: 2 ligands -> cluster of 4
    info = cluster_labels(out, cfg)
    assert int(info.size[0]) == 4
