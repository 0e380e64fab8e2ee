"""Fused Pallas kernel for the idealization core (engine/align.py).

The XLA lowering of the depth-propagation + snap-sweep executes as dozens
of small kernels per step and dominates the particle-engine step time
(~43 ms of a ~54 ms step at batch 256 on v5e, vs ~0.02 ms for everything
else — see CLAUDE.md measurements).  This kernel runs the whole core —
BFS depth/parent assignment and all align_depth snap sweeps — as ONE
program per replica (grid = replicas), with every dynamic gather expressed
as a one-hot matmul (Mosaic has no general dynamic-gather; [n, n] one-hot
contractions are tiny MXU work at n = 200).

Inputs are the pose/topology arrays plus the externally-drawn root mask;
outputs are the snapped poses + lay-down flags.  The surrounding jnp code
(root choice, collision revert) stays in engine/align.py — it measures
~free under XLA.

Bitwise parity with the jnp path is asserted in tests/test_pallas_align.py
(same arithmetic, same order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmc_tpu.config import SimConfig
from kmc_tpu.geometry import align_angle_2d, quat_axis_z, quat_rotate
from kmc_tpu.models.tnfr import (
    b_center_offset,
    cis_offsets,
    ligand_template,
    trans_offsets,
)

_INF = 30000


def _onehot_f32(idx, num):
    """[m, num] one-hot matrix of clamped indices (f32 for MXU matmuls)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], num), 1)
    return (idx[:, None] == cols).astype(jnp.float32)


def _gather_rows(oh, x):
    """rows x[idx] via one-hot matmul: oh [m, n] @ x [n, k] -> [m, k]."""
    return jax.lax.dot_general(
        oh, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _align_kernel(a_xy_ref, a_psi_ref, b_center_ref, b_quat_ref,
                  a_trans_ref, a_site_ref, a_cis_ref, b_partner_ref,
                  b_laid_ref, is_root_ref, act_ref, tmpl_ref,
                  out_a_xy, out_a_psi, out_b_center, out_b_quat, out_b_laid,
                  *, cfg: SimConfig):
    na, nb, n = cfg.n_a, cfg.n_b, cfg.n
    ra = cfg.rb_a_radius
    # the template is a kernel INPUT: array constants materialized during
    # tracing become jaxpr consts, which pallas rejects
    tmpl = tmpl_ref[:]
    t_off = trans_offsets(cfg)
    c_off = cis_offsets(cfg)
    seat_r = b_center_offset(cfg)
    plane_z = cfg.plane_z

    a_xy = a_xy_ref[:]                      # [na, 2]
    a_psi = a_psi_ref[:]                    # [na, 1]
    b_center = b_center_ref[:]              # [nb, 3]
    b_quat = b_quat_ref[:]                  # [nb, 4]
    a_trans = a_trans_ref[:]                # [na, 1]
    a_site = a_site_ref[:]                  # [na, 1]
    a_cis = a_cis_ref[:]                    # [na, 1]
    b_partner = b_partner_ref[:]            # [nb, 3]
    b_laid = b_laid_ref[:]                  # [nb, 1] int32 0/1
    is_root = is_root_ref[:]                # [n, 1]  int32 0/1
    act = act_ref[:]                        # [n, 1]  int32 0/1 (size > 1)

    # ---- neighbor matrix [n, 3] (state.neighbors) ----
    nbr = jnp.concatenate(
        [
            jnp.concatenate(
                [a_trans, a_cis, jnp.full((na, 1), -1, jnp.int32)], axis=1
            ),
            b_partner,
        ],
        axis=0,
    )
    valid = (nbr >= 0).astype(jnp.float32)                    # [n, 3]
    oh_nbr = [  # one-hot per neighbor column, [n, n]
        _onehot_f32(jnp.clip(nbr[:, c], 0, n - 1), n) for c in range(3)
    ]

    # ---- BFS depth via min-propagation (engine/align._depth_and_parent) ----
    depth = jnp.where(is_root[:, 0] == 1, 0, _INF).astype(jnp.float32)[:, None]
    for _ in range(cfg.align_depth):
        nd = depth
        for c in range(3):
            g = _gather_rows(oh_nbr[c], depth) + 1.0
            g = jnp.where(valid[:, c:c + 1] > 0, g, float(_INF))
            nd = jnp.minimum(nd, g)
        depth = nd
    # parent = first neighbor column at depth - 1
    pardepth = [
        jnp.where(valid[:, c:c + 1] > 0, _gather_rows(oh_nbr[c], depth),
                  float(_INF))
        for c in range(3)
    ]
    is_par = [pd == depth - 1.0 for pd in pardepth]
    parent = jnp.full((n, 1), -1, jnp.int32)
    for c in (2, 1, 0):                      # priority: first matching column
        parent = jnp.where(is_par[c], nbr[:, c:c + 1], parent)

    # ---- root ligand lay-down in place ----
    root_b = ((is_root[na:, 0] == 1) & (act[na:, 0] == 1)
              & (b_laid[:, 0] == 0))
    bead1_dir = quat_rotate(b_quat, jnp.broadcast_to(tmpl[1, 0], (nb, 3)))
    alpha0 = align_angle_2d(jnp.broadcast_to(tmpl[1, 0, :2], (nb, 2)),
                            bead1_dir[:, :2])
    b_quat = jnp.where(root_b[:, None], quat_axis_z(alpha0), b_quat)
    b_center = jnp.concatenate(
        [b_center[:, :2],
         jnp.where(root_b[:, None], plane_z, b_center[:, 2:3])], axis=1
    )
    b_laid_new = jnp.where(root_b[:, None], 1, b_laid)

    # ---- snap sweeps ----
    par_a = parent[:na, 0]
    par_is_b = par_a >= na
    oh_pb = _onehot_f32(jnp.clip(par_a - na, 0, nb - 1), nb)   # [na, nb]
    oh_site = _onehot_f32(jnp.clip(a_site[:, 0], 1, 3) - 1, 3)  # [na, 3]
    site_t = jnp.stack([tmpl[j, 1] for j in (1, 2, 3)])         # [3, 3]
    bead_t = jnp.stack([tmpl[j, 0] for j in (1, 2, 3)])
    my_site_v = _gather_rows(oh_site, site_t)                   # [na, 3] local
    my_bead_v = _gather_rows(oh_site, bead_t)
    oh_pa = _onehot_f32(jnp.clip(par_a, 0, na - 1), na)         # [na, na]

    par_b = parent[na:, 0]
    oh_pa2 = _onehot_f32(jnp.clip(par_b, 0, na - 1), na)        # [nb, na]
    ghost_b = _gather_rows(
        _onehot_f32(
            jnp.clip(
                (_gather_rows(oh_pa2, a_site.astype(jnp.float32))[:, 0]
                 ).astype(jnp.int32), 1, 3) - 1, 3),
        bead_t,
    )[:, :2]                                                    # [nb, 2]

    depth_a = depth[:na, 0]
    depth_b = depth[na:, 0]

    for d in range(1, cfg.align_depth + 1):
        # --- A children ---
        sel_a = ((act[:na, 0] == 1) & (depth_a == d) & (par_a >= 0))
        qp = _gather_rows(oh_pb, b_quat)                        # [na, 4]
        ctrp = _gather_rows(oh_pb, b_center)                    # [na, 3]
        bsite = ctrp + quat_rotate(qp, my_site_v)
        bbead = ctrp + quat_rotate(qp, my_bead_v)
        u_t = bsite[:, :2] - bbead[:, :2]
        u_t = u_t / jnp.maximum(
            jnp.sqrt(jnp.sum(u_t * u_t, axis=1, keepdims=True)), 1e-9
        )
        xy_trans = bsite[:, :2] + t_off[0] * u_t
        psi_trans = jnp.arctan2(-u_t[:, 1], -u_t[:, 0])

        psi_p = _gather_rows(oh_pa, a_psi)[:, 0]                # [na]
        ux = jnp.stack([jnp.cos(psi_p), jnp.sin(psi_p)], axis=-1)
        cis_site = _gather_rows(oh_pa, a_xy) - ra * ux
        xy_cis = cis_site + c_off[0] * (-ux)
        psi_cis = jnp.arctan2(-ux[:, 1], -ux[:, 0])

        new_xy = jnp.where(par_is_b[:, None], xy_trans, xy_cis)
        new_psi = jnp.where(par_is_b, psi_trans, psi_cis)
        a_xy = jnp.where(sel_a[:, None], new_xy, a_xy)
        a_psi = jnp.where(sel_a[:, None], new_psi[:, None], a_psi)

        # --- B children ---
        sel_b = ((act[na:, 0] == 1) & (depth_b == d) & (par_b >= 0))
        psi_p2 = _gather_rows(oh_pa2, a_psi)[:, 0]              # [nb]
        ux2 = jnp.stack([jnp.cos(psi_p2), jnp.sin(psi_p2)], axis=-1)
        asite = _gather_rows(oh_pa2, a_xy) + ra * ux2
        ctr_xy = asite + seat_r * ux2
        alpha = align_angle_2d(ghost_b, -ux2)
        b_center = jnp.where(
            sel_b[:, None],
            jnp.concatenate(
                [ctr_xy, jnp.full((nb, 1), plane_z, jnp.float32)], axis=1
            ),
            b_center,
        )
        b_quat = jnp.where(sel_b[:, None], quat_axis_z(alpha), b_quat)
        b_laid_new = jnp.where(sel_b[:, None], 1, b_laid_new)

    out_a_xy[:] = a_xy
    out_a_psi[:] = a_psi
    out_b_center[:] = b_center
    out_b_quat[:] = b_quat
    out_b_laid[:] = b_laid_new


def align_core(state, is_root, act, cfg: SimConfig, interpret=None):
    """Run the fused idealize core for ONE replica (vmap for ensembles).
    Returns (a_xy, a_psi, b_center, b_quat, b_laid)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    na, nb, n = cfg.n_a, cfg.n_b, cfg.n
    call = pl.pallas_call(
        functools.partial(_align_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((na, 2), jnp.float32),
            jax.ShapeDtypeStruct((na, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, 3), jnp.float32),
            jax.ShapeDtypeStruct((nb, 4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 5),
        interpret=interpret,
    )
    a_xy, a_psi, b_center, b_quat, b_laid = call(
        state.a_xy,
        state.a_psi[:, None],
        state.b_center,
        state.b_quat,
        state.a_trans[:, None],
        state.a_site[:, None],
        state.a_cis[:, None],
        state.b_partner,
        state.b_laid[:, None].astype(jnp.int32),
        is_root[:, None].astype(jnp.int32),
        act[:, None].astype(jnp.int32),
        ligand_template(cfg),
    )
    return a_xy, a_psi[:, 0], b_center, b_quat, b_laid[:, 0] > 0
