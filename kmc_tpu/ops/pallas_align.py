"""Fused Pallas kernel for the idealization core (engine/align.py).

The XLA lowering of the depth-propagation + snap-sweep executes as dozens
of small kernels per step and dominates the particle-engine step time
(~43 ms of a ~54 ms step at batch 256 on v5e, vs ~0.02 ms for everything
else — see CLAUDE.md measurements).  This kernel runs the whole core —
BFS depth/parent assignment and all align_depth snap sweeps — as ONE
program per replica (grid = replicas), with every dynamic gather expressed
as a one-hot matmul (Mosaic has no general dynamic-gather; [n, n] one-hot
contractions are tiny MXU work at n = 200).

Mosaic has no ``atan2``/``sin``/``cos`` lowering, so the kernel is
**transcendental-free**: receptor orientations travel as unit direction
vectors (cos ψ, sin ψ) instead of angles, and z-axis quaternions are built
from (cos α, sin α) via the algebraic half-angle identities
cos(α/2) = √((1+cos α)/2), sin(α/2) = sign(sin α)·√((1−cos α)/2)
(α ∈ (−π, π], so cos(α/2) ≥ 0).  The wrapper converts ψ → direction on
the way in and direction → ψ (one XLA ``arctan2``) on the way out; a
snapped-mask output keeps un-snapped ψ bitwise untouched.

Inputs are the pose/topology arrays plus the externally-drawn root mask;
outputs are the snapped poses + lay-down flags.  The surrounding jnp code
(root choice, collision revert) stays in engine/align.py — it measures
~free under XLA.

Parity with the jnp path (same geometry to f32 round-off; the direction-
vector representation differs from cos(atan2(...)) by ~1 ulp) is asserted
in tests/test_pallas_align.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmc_tpu.config import SimConfig
from kmc_tpu.geometry import quat_rotate
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


def _quat_z_from_cs(dot, det):
    """Unit quaternion rotating about +z by α = atan2(det, dot), without
    transcendentals (half-angle identities; geometry.quat_axis_z analogue).
    dot/det need not be normalized — only their direction matters."""
    r = jnp.maximum(jnp.sqrt(dot * dot + det * det), 1e-12)
    c = dot / r
    ch = jnp.sqrt(jnp.maximum((1.0 + c) * 0.5, 0.0))
    sh = jnp.sqrt(jnp.maximum((1.0 - c) * 0.5, 0.0))
    sh = jnp.where(det < 0, -sh, sh)                 # atan2(0, -1) = +π
    z = jnp.zeros_like(ch)
    return jnp.stack([ch, z, z, sh], axis=-1)


def _align_kernel(a_xy_ref, a_dir_ref, b_center_ref, b_quat_ref,
                  a_trans_ref, a_site_ref, a_cis_ref, b_partner_ref,
                  b_laid_ref, is_root_ref, act_ref, tmpl_ref,
                  out_a_xy, out_a_dir, out_a_snap, out_b_center, out_b_quat,
                  out_b_laid, *, cfg: SimConfig):
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
    a_dir = a_dir_ref[:]                    # [na, 2] (cos ψ, sin ψ)
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
    # align tmpl bead-1 xy onto the current bead-1 xy: α0 = atan2(det, dot)
    tx, ty = tmpl[1, 0, 0], tmpl[1, 0, 1]
    dot0 = tx * bead1_dir[:, 0] + ty * bead1_dir[:, 1]
    det0 = tx * bead1_dir[:, 1] - ty * bead1_dir[:, 0]
    b_quat = jnp.where(root_b[:, None], _quat_z_from_cs(dot0, det0), b_quat)
    # z := plane_z on root ligands.  Mosaic rejects concatenation of slices
    # ("offset mismatch on non-concat dimension"), so mask the z column.
    col3 = jax.lax.broadcasted_iota(jnp.int32, (nb, 3), 1)
    b_center = jnp.where((col3 == 2) & root_b[:, None], plane_z, b_center)
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
    a_snap = jnp.zeros((na, 1), jnp.int32)

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
        dir_trans = -u_t                                        # ψ faces the B

        ux = _gather_rows(oh_pa, a_dir)                         # [na, 2]
        cis_site = _gather_rows(oh_pa, a_xy) - ra * ux
        xy_cis = cis_site + c_off[0] * (-ux)
        dir_cis = -ux                                           # ψ faces parent

        new_xy = jnp.where(par_is_b[:, None], xy_trans, xy_cis)
        new_dir = jnp.where(par_is_b[:, None], dir_trans, dir_cis)
        a_xy = jnp.where(sel_a[:, None], new_xy, a_xy)
        a_dir = jnp.where(sel_a[:, None], new_dir, a_dir)
        a_snap = jnp.where(sel_a[:, None], 1, a_snap)

        # --- B children ---
        sel_b = ((act[na:, 0] == 1) & (depth_b == d) & (par_b >= 0))
        ux2 = _gather_rows(oh_pa2, a_dir)                       # [nb, 2]
        asite = _gather_rows(oh_pa2, a_xy) + ra * ux2
        ctr_xy = asite + seat_r * ux2
        # align ghost bead direction onto −ux2: α = atan2(det, dot)
        dot = ghost_b[:, 0] * (-ux2[:, 0]) + ghost_b[:, 1] * (-ux2[:, 1])
        det = ghost_b[:, 0] * (-ux2[:, 1]) - ghost_b[:, 1] * (-ux2[:, 0])
        # [nb, 3] center = (ctr_x, ctr_y, plane_z) without concatenate:
        # pad xy to 3 columns via a [2, 3] identity matmul, mask in z.
        pad23 = (jax.lax.broadcasted_iota(jnp.int32, (2, 3), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (2, 3), 1)
                 ).astype(jnp.float32)
        ctr3 = jax.lax.dot_general(
            ctr_xy, pad23, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ctr3 = jnp.where(col3 == 2, plane_z, ctr3)
        b_center = jnp.where(sel_b[:, None], ctr3, b_center)
        b_quat = jnp.where(sel_b[:, None], _quat_z_from_cs(dot, det), b_quat)
        b_laid_new = jnp.where(sel_b[:, None], 1, b_laid_new)

    # mark active non-root molecules the depth sweep never reached (chain
    # deeper than align_depth): a_snap = 2, b_laid bit 1.  The wrapper
    # folds these into the dirty flag so the lazy ensemble path keeps
    # realigning the replica (random roots cover the chain over passes)
    # instead of permanently skipping a partially-idealized cluster.
    unr_a = ((act[:na, 0] == 1) & (is_root[:na, 0] == 0)
             & (depth_a >= float(_INF)))
    a_snap = jnp.where(unr_a[:, None], 2, a_snap)
    unr_b = ((act[na:, 0] == 1) & (is_root[na:, 0] == 0)
             & (depth_b >= float(_INF)))
    b_laid_new = jnp.where(unr_b[:, None], b_laid_new + 2, b_laid_new)

    out_a_xy[:] = a_xy
    out_a_dir[:] = a_dir
    out_a_snap[:] = a_snap
    out_b_center[:] = b_center
    out_b_quat[:] = b_quat
    out_b_laid[:] = b_laid_new


@functools.lru_cache(maxsize=None)
def _core_for(cfg: SimConfig, interpret: bool):
    """custom_vmap'd fused core: unbatched calls run the single-replica
    kernel above; a vmapped call (the ensemble path) dispatches to the
    replica-batched kernel (ops/pallas_align_batched.py) instead of the
    default grid-per-replica rule — Mosaic runs grids sequentially, so the
    per-replica grid was latency-bound (measured ~30 ms of a 38.5 ms step
    at batch 256)."""
    from kmc_tpu.ops.pallas_align_batched import align_core_batched

    na, nb, n = cfg.n_a, cfg.n_b, cfg.n
    single = pl.pallas_call(
        functools.partial(_align_kernel, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((na, 2), jnp.float32),
            jax.ShapeDtypeStruct((na, 2), jnp.float32),
            jax.ShapeDtypeStruct((na, 1), jnp.int32),
            jax.ShapeDtypeStruct((nb, 3), jnp.float32),
            jax.ShapeDtypeStruct((nb, 4), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
        interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def core(a_xy, a_dir, b_center, b_quat, a_trans, a_site, a_cis,
             b_partner, b_laid, is_root, act, tmpl):
        a_xy, a_dir, a_snap, b_center, b_quat, b_laid = single(
            a_xy, a_dir, b_center, b_quat,
            a_trans[:, None], a_site[:, None], a_cis[:, None], b_partner,
            b_laid[:, None], is_root[:, None], act[:, None], tmpl,
        )
        return (a_xy, a_dir, a_snap[:, 0], b_center, b_quat, b_laid[:, 0])

    @core.def_vmap
    def _core_vmap(axis_size, in_batched, *args):
        tmpl = args[-1]
        if in_batched[-1]:                    # template never varies
            tmpl = tmpl[0]
        bargs = [
            x if bat else jnp.broadcast_to(x[None], (axis_size, *x.shape))
            for x, bat in zip(args[:-1], in_batched[:-1])
        ]
        outs = align_core_batched(*bargs, tmpl, cfg, interpret=interpret)
        return outs, tuple(True for _ in outs)

    return core


def align_core(state, is_root, act, cfg: SimConfig, interpret=None):
    """Run the fused idealize core for ONE replica (vmap for ensembles —
    batched calls run a replica-blocked kernel via custom_vmap).
    Returns (a_xy, a_psi, b_center, b_quat, b_laid, unreached) where
    ``unreached`` flags active molecules beyond align_depth this pass."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a_dir_in = jnp.stack(
        [jnp.cos(state.a_psi), jnp.sin(state.a_psi)], axis=-1
    )
    core = _core_for(cfg, interpret)
    a_xy, a_dir, a_snap_v, b_center, b_quat, b_laid_v = core(
        state.a_xy,
        a_dir_in,
        state.b_center,
        state.b_quat,
        state.a_trans,
        state.a_site,
        state.a_cis,
        state.b_partner,
        state.b_laid.astype(jnp.int32),
        is_root.astype(jnp.int32),
        act.astype(jnp.int32),
        ligand_template(cfg),
    )
    # ψ reconstruction happens in XLA (Mosaic has no atan2); un-snapped
    # receptors (snap != 1; snap == 2 marks unreached-but-active) keep
    # their state ψ bitwise.
    a_psi = jnp.where(
        a_snap_v == 1,
        jnp.arctan2(a_dir[:, 1], a_dir[:, 0]),
        state.a_psi,
    )
    # any active non-root molecule beyond align_depth -> caller keeps the
    # replica dirty (lazy path must not skip a partially-idealized chain)
    unreached = jnp.any(a_snap_v == 2) | jnp.any(b_laid_v >= 2)
    return a_xy, a_psi, b_center, b_quat, (b_laid_v & 1) > 0, unreached
