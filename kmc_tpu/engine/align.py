"""Bond-geometry idealization (components C13-C14 of SURVEY.md §2).

After bonds form (at loose gate geometry: distance/angle cutoffs), the
reference snaps molecules onto exact ideal bond frames: ligand "lay-down"
onto the membrane plane (main.cpp:1138-1193), receptors seated colinearly
behind their ligand site (:1284-1332), cis pairs at exact cis geometry
(:770-799, :1341-1406), and ligands re-seated through cis-linked receptors
(:1411-1590) — iterated in random_shuffle order with goto-retries until
consistent, then collision-checked with whole-complex revert (:1759-1860).

The TPU design replaces that cascade with deterministic constraint
projection along a BFS tree:

1.  pick a root per cluster (a random *laid* ligand for ligand-containing
    clusters — the analogue of random_shuffle deciding which sub-complex
    stays put; the min-index receptor for pure cis pairs);
2.  compute per-molecule BFS depth and parent by bounded min-propagation
    (align_depth rounds — far beyond physical complex diameters);
3.  sweep depths 1..align_depth, snapping every molecule at depth d onto
    its already-snapped parent in parallel (A<-B trans seat, A<-A cis seat,
    B<-A re-seat with lay-down);
4.  collision-check every cluster whose geometry actually changed and
    revert it wholesale on overlap (retried next step, as the reference
    retries via its per-step cascade).

Because snapped frames are mutually consistent, a fully idealized cluster is
a fixed point: the sweep is a no-op except in the step right after a
topology change, matching the reference's AreSame guards (:782, :1215, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.clusters import ClusterInfo
from kmc_tpu.engine.diffusion import cluster_reject
from kmc_tpu.geometry import align_angle_2d, quat_axis_z, quat_rotate
from kmc_tpu.ops import dense
from kmc_tpu.ops.segment import seg_max, seg_min
from kmc_tpu.models.tnfr import (
    b_center_offset,
    cis_offsets,
    ligand_template,
    trans_offsets,
)
from kmc_tpu.state import SimState, neighbors, positions

_INF = jnp.int32(30000)


def _depth_and_parent(state: SimState, info: ClusterInfo, is_root, cfg: SimConfig):
    nbr = neighbors(state, cfg)                          # [n, 3]
    depth = jnp.where(is_root, 0, _INF)

    # unrolled: loop bodies don't fuse across lax.fori_loop iterations on
    # TPU, and these are tiny gather+min ops — straight-line code lets XLA
    # fuse the whole propagation (measured ~5x faster at batch 256)
    clipped = jnp.clip(nbr, 0)
    for _ in range(cfg.align_depth):
        nd = jnp.where(nbr >= 0, depth[clipped] + 1, _INF)
        depth = jnp.minimum(depth, jnp.min(nd, axis=1))

    # parent = first neighbor column whose depth is ours - 1
    nd = jnp.where(nbr >= 0, depth[jnp.clip(nbr, 0)], _INF)
    is_par = nd == (depth[:, None] - 1)
    col = jnp.argmax(is_par, axis=1)
    has_par = jnp.any(is_par, axis=1)
    parent = jnp.where(has_par, jnp.take_along_axis(nbr, col[:, None], 1)[:, 0], -1)
    return depth, parent


def _choose_roots(state: SimState, info: ClusterInfo, skey, cfg: SimConfig):
    """Random laid-ligand root per B-cluster; min-index root otherwise."""
    n, na = cfg.n, cfg.n_a
    idx = jnp.arange(n)
    is_b = idx >= na
    laid_full = jnp.concatenate([jnp.zeros((na,), bool), state.b_laid])
    u = jax.random.uniform(skey, (n,))
    # prefer laid ligands, then unlaid ligands; receptors never root B-clusters
    prio = u + jnp.where(laid_full, 0.0, 10.0) + jnp.where(is_b, 0.0, 1e6)
    prio = prio + idx * 1e-7                              # deterministic tiebreak
    best = seg_min(prio, info.label, n)
    # non-label rows hold seg_min's +inf filler — a matmul gather would turn
    # 0*inf into NaN, so replace with a finite sentinel (never selected)
    best = jnp.where(jnp.isfinite(best), best, 3e9)
    best_m = dense.take(best, dense.onehot(info.label, n))  # per molecule
    root_b = (jnp.abs(prio - best_m) < 1e-9) & is_b & (info.n_b > 0)
    root_a = (idx == info.label) & (info.n_b == 0)
    return root_b | root_a


def idealize_fused(state: SimState, info: ClusterInfo, skey,
                   cfg: SimConfig, interpret=None) -> SimState:
    """idealize with the depth+sweep core as one fused Pallas kernel
    (ops/pallas_align.py); root choice and the collision revert stay in XLA.
    Numerically equivalent to idealize within <=1e-4 A / 1e-5 rad (the kernel
    evaluates the same math with ~1 ulp representation differences; see
    tests/test_pallas_align.py)."""
    from kmc_tpu.ops.pallas_align import align_core

    n, na = cfg.n, cfg.n_a
    is_root = _choose_roots(state, info, skey, cfg)
    act = info.size > 1
    a_xy, a_psi, b_center, b_quat, b_laid, unreached = align_core(
        state, is_root, act, cfg, interpret=interpret
    )
    prop = state._replace(a_xy=a_xy, a_psi=a_psi, b_center=b_center,
                          b_quat=b_quat, b_laid=b_laid)
    return _collision_revert(state, prop, info, cfg, extra_dirty=unreached)


def _collision_revert(state: SimState, prop: SimState, info: ClusterInfo,
                      cfg: SimConfig, extra_dirty=False) -> SimState:
    """Whole-cluster revert of changed clusters that now overlap
    (main.cpp:1759-1860)."""
    n, na = cfg.n, cfg.n_a
    tol = 1e-3
    moved_a = (
        jnp.max(jnp.abs(prop.a_xy - state.a_xy), axis=1) > tol
    ) | (jnp.abs(prop.a_psi - state.a_psi) > 1e-4)
    moved_b = (
        jnp.max(jnp.abs(prop.b_center - state.b_center), axis=1) > tol
    ) | (jnp.max(jnp.abs(prop.b_quat - state.b_quat), axis=1) > 1e-4)
    moved = jnp.concatenate([moved_a, moved_b])
    changed = seg_max(moved, info.label, n)               # per label

    p_new = positions(prop, cfg)
    rej = cluster_reject(p_new, p_new, info.label, cfg) & changed
    keep = ~dense.take(rej, dense.onehot(info.label, n))  # per molecule

    # reverted clusters stay un-idealized -> retried next step; a revert-
    # free pass leaves every active cluster at ideal geometry (clean)
    # unless a chain ran beyond align_depth this pass (extra_dirty, ADVICE
    # r2: the lazy path must keep realigning until a pass covers all)
    return state._replace(
        a_xy=jnp.where(keep[:na, None], prop.a_xy, state.a_xy),
        a_psi=jnp.where(keep[:na], prop.a_psi, state.a_psi),
        b_center=jnp.where(keep[na:, None], prop.b_center, state.b_center),
        b_quat=jnp.where(keep[na:, None], prop.b_quat, state.b_quat),
        b_laid=jnp.where(keep[na:], prop.b_laid, state.b_laid),
        dirty=jnp.any(rej) | extra_dirty,
    )


def idealize(state: SimState, info: ClusterInfo, skey, cfg: SimConfig) -> SimState:
    n, na, nb = cfg.n, cfg.n_a, cfg.n_b
    ra, rb = cfg.rb_a_radius, cfg.rb_b_radius
    tmpl = ligand_template(cfg)                          # [4, 4, 3]
    t_off = trans_offsets(cfg)
    c_off = cis_offsets(cfg)
    seat_r = b_center_offset(cfg)
    plane_z = cfg.plane_z

    is_root = _choose_roots(state, info, skey, cfg)
    depth, parent = _depth_and_parent(state, info, is_root, cfg)

    # aligned clusters: ligand clusters of size > 1, and pure cis pairs
    active = (info.size > 1)
    # molecules in active clusters only
    act = active
    # chain deeper than align_depth: unreached this pass -> stay dirty
    unreached = jnp.any(act & (~is_root) & (depth >= _INF))

    # ---- root ligand lay-down in place (main.cpp:1138-1193) ----
    b_idx = jnp.arange(nb)
    root_b = is_root[na:] & act[na:] & (~state.b_laid)
    bead1_dir = quat_rotate(
        state.b_quat, jnp.broadcast_to(tmpl[1, 0], (nb, 3))
    )[:, :2]                                              # current bead-1 xy dir
    alpha0 = align_angle_2d(
        jnp.broadcast_to(tmpl[1, 0, :2], (nb, 2)), bead1_dir
    )
    b_quat = jnp.where(root_b[:, None], quat_axis_z(alpha0), state.b_quat)
    b_center = state.b_center.at[:, 2].set(
        jnp.where(root_b, plane_z, state.b_center[:, 2])
    )
    b_laid = state.b_laid | root_b

    a_xy, a_psi = state.a_xy, state.a_psi

    # ---- depth sweep ----
    def sweep(d, carry):
        a_xy, a_psi, b_center, b_quat, b_laid = carry

        # --- A children ---
        ai = jnp.arange(na)
        par = parent[:na]
        sel_a = act[:na] & (depth[:na] == d) & (par >= 0)
        par_is_b = par >= na

        # A <- B trans seat (main.cpp:1313-1325)
        pb = jnp.clip(par - na, 0, nb - 1)
        site_bead = jnp.clip(state.a_site, 1, 3)          # bound B bead 1..3
        qp = b_quat[pb]                                   # [na, 4]
        bsite = b_center[pb] + quat_rotate(qp, tmpl[site_bead, 1])
        bbead = b_center[pb] + quat_rotate(qp, tmpl[site_bead, 0])
        u_t = (bsite[:, :2] - bbead[:, :2])
        u_t = u_t / jnp.maximum(jnp.linalg.norm(u_t, axis=1, keepdims=True), 1e-9)
        xy_trans = bsite[:, :2] + t_off[0] * u_t
        psi_trans = jnp.arctan2(-u_t[:, 1], -u_t[:, 0])   # +x axis faces the B

        # A <- A cis seat (main.cpp:1389-1401)
        pa = jnp.clip(par, 0, na - 1)
        ux = jnp.stack([jnp.cos(a_psi[pa]), jnp.sin(a_psi[pa])], axis=-1)
        cis_site = a_xy[pa] - ra * ux                     # parent's -x site
        u_c = -ux
        xy_cis = cis_site + c_off[0] * u_c
        psi_cis = jnp.arctan2(u_c[:, 1], u_c[:, 0])       # +x axis faces parent

        new_xy = jnp.where(par_is_b[:, None], xy_trans, xy_cis)
        new_psi = jnp.where(par_is_b, psi_trans, psi_cis)
        a_xy = jnp.where(sel_a[:, None], new_xy, a_xy)
        a_psi = jnp.where(sel_a, new_psi, a_psi)

        # --- B children (parent is always an A; main.cpp:1438-1501) ---
        parb = parent[na:]
        sel_b = act[na:] & (depth[na:] == d) & (parb >= 0)
        pa2 = jnp.clip(parb, 0, na - 1)
        ux2 = jnp.stack([jnp.cos(a_psi[pa2]), jnp.sin(a_psi[pa2])], axis=-1)
        asite = a_xy[pa2] + ra * ux2                      # parent's trans site
        ctr_xy = asite + seat_r * ux2
        jbead = jnp.clip(state.a_site[pa2], 1, 3)         # bead bound to parent
        ghost = tmpl[jbead, 0, :2]                        # local bead direction
        alpha = align_angle_2d(ghost, -ux2)               # bead points at parent
        b_center = jnp.where(
            sel_b[:, None],
            jnp.concatenate([ctr_xy, jnp.full((nb, 1), plane_z)], axis=1),
            b_center,
        )
        b_quat = jnp.where(sel_b[:, None], quat_axis_z(alpha), b_quat)
        b_laid = b_laid | sel_b
        return a_xy, a_psi, b_center, b_quat, b_laid

    carry = (a_xy, a_psi, b_center, b_quat, b_laid)
    for d in range(1, cfg.align_depth + 1):
        carry = sweep(d, carry)
    a_xy, a_psi, b_center, b_quat, b_laid = carry

    prop = state._replace(
        a_xy=a_xy, a_psi=a_psi, b_center=b_center, b_quat=b_quat, b_laid=b_laid
    )

    # ---- collision check + whole-cluster revert (main.cpp:1759-1860) ----
    tol = 1e-3
    moved_a = (
        jnp.max(jnp.abs(prop.a_xy - state.a_xy), axis=1) > tol
    ) | (jnp.abs(prop.a_psi - state.a_psi) > 1e-4)
    moved_b = (
        jnp.max(jnp.abs(prop.b_center - state.b_center), axis=1) > tol
    ) | (jnp.max(jnp.abs(prop.b_quat - state.b_quat), axis=1) > 1e-4)
    moved = jnp.concatenate([moved_a, moved_b])
    changed = seg_max(moved, info.label, n)               # per label

    p_new = positions(prop, cfg)
    rej = cluster_reject(p_new, p_new, info.label, cfg) & changed
    keep = ~dense.take(rej, dense.onehot(info.label, n))  # per molecule

    # reverted clusters stay un-idealized -> retried next step; a revert-
    # free pass leaves every active cluster at ideal geometry (clean)
    # unless a chain ran beyond align_depth this pass (see idealize_fused)
    return state._replace(
        a_xy=jnp.where(keep[:na, None], prop.a_xy, state.a_xy),
        a_psi=jnp.where(keep[:na], prop.a_psi, state.a_psi),
        b_center=jnp.where(keep[na:, None], prop.b_center, state.b_center),
        b_quat=jnp.where(keep[na:, None], prop.b_quat, state.b_quat),
        b_laid=jnp.where(keep[na:], prop.b_laid, state.b_laid),
        dirty=jnp.any(rej) | unreached,
    )
