"""Test helpers: hand-built states in exact bond geometries."""

import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.init import random_init
from kmc_tpu.geometry import quat_axis_z
from kmc_tpu.state import SimState


def spread_state(cfg: SimConfig, seed: int = 0) -> SimState:
    """Random init (guaranteed well-separated molecules)."""
    return random_init(cfg, seed)


def place_receptor(st: SimState, i, xy, psi) -> SimState:
    return st._replace(
        a_xy=st.a_xy.at[i].set(jnp.asarray(xy, jnp.float32)),
        a_psi=st.a_psi.at[i].set(psi),
    )


def place_ligand_laid(st: SimState, b, center_xy, alpha, cfg: SimConfig) -> SimState:
    """Put ligand b laid down in the membrane plane with azimuth alpha."""
    c = jnp.asarray([center_xy[0], center_xy[1], cfg.plane_z], jnp.float32)
    return st._replace(
        b_center=st.b_center.at[b].set(c),
        b_quat=st.b_quat.at[b].set(quat_axis_z(alpha)),
        b_laid=st.b_laid.at[b].set(True),
    )


def ideal_trans_pair(st: SimState, a, b, site, cfg: SimConfig,
                     center_xy=(0.0, 0.0), alpha=0.0, bond=False) -> SimState:
    """Ligand b laid at center_xy/azimuth alpha; receptor a ideally seated
    behind bead ``site`` (1..3).  With bond=True the topology links them."""
    import numpy as np

    from kmc_tpu.models.tnfr import ligand_template, trans_offsets

    st = place_ligand_laid(st, b, center_xy, alpha, cfg)
    tmpl = np.asarray(ligand_template(cfg))
    ca, sa = np.cos(alpha), np.sin(alpha)

    def rot(v):
        return np.array([v[0] * ca - v[1] * sa, v[0] * sa + v[1] * ca])

    bead = rot(tmpl[site, 0, :2]) + np.asarray(center_xy)
    bsite = rot(tmpl[site, 1, :2]) + np.asarray(center_xy)
    u = (bsite - bead) / np.linalg.norm(bsite - bead)
    t0 = trans_offsets(cfg)[0]
    a_xy = bsite + t0 * u
    a_psi = float(np.arctan2(-u[1], -u[0]))
    st = place_receptor(st, a, a_xy, a_psi)
    if bond:
        na = cfg.n_a
        st = st._replace(
            a_trans=st.a_trans.at[a].set(na + b),
            a_site=st.a_site.at[a].set(site),
            b_partner=st.b_partner.at[b, site - 1].set(a),
        )
    return st


def ideal_cis_pair(st: SimState, a1, a2, cfg: SimConfig,
                   xy=(0.0, 0.0), psi=0.0, bond=False) -> SimState:
    """Receptor a1 at xy/psi; a2 ideally cis-seated off a1's -x site."""
    import numpy as np

    from kmc_tpu.models.tnfr import cis_offsets

    st = place_receptor(st, a1, xy, psi)
    ux = np.array([np.cos(psi), np.sin(psi)])
    cis_site = np.asarray(xy) - cfg.rb_a_radius * ux
    u = -ux
    a2_xy = cis_site + cis_offsets(cfg)[0] * u
    a2_psi = float(np.arctan2(u[1], u[0]))
    st = place_receptor(st, a2, a2_xy, a2_psi)
    if bond:
        st = st._replace(a_cis=st.a_cis.at[a1].set(a2).at[a2].set(a1))
    return st
