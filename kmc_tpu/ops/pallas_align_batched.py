"""Replica-batched Pallas kernel for the idealization core (SoA form).

The single-replica kernel (ops/pallas_align.py) under ``vmap`` becomes
``grid = (replicas,)``: Mosaic executes the grid sequentially on the one
TensorCore, so a 256-replica ensemble runs 256 latency-bound programs of
~450 tiny sequential ops each (~30 ms of a 38.5 ms step, measured round 2).
This kernel processes a BLOCK of ``rb`` replicas per grid step instead
(grid = batch/rb): the sequential-program count drops by ``rb`` while every
op widens by the same factor — the chain is latency-bound, not
throughput-bound, at n = 200 molecules.

Two Mosaic hardware constraints shape the design (both found the hard way;
interpret mode accepts everything):
  * minor-dim insertion/concatenation of values with mismatched lane
    offsets is unsupported ("offset mismatch on non-concat dimension",
    "reshape ... i1"), so the kernel is pure **SoA**: every vector
    quantity travels as separate [rb, m] component arrays; nothing is
    ever stacked or concatenated inside the kernel (the XLA wrapper
    splits/rejoins components for free);
  * there is no dynamic-gather primitive, and per-replica gathers can't
    be one-hot matmuls (each replica gathers from its own table), so
    gathers are masked lane reductions ``out[b,i] = Σ_j (idx[b,i]==j)
    x[b,j]`` over [rb, m_dst, m_src] one-hot masks, precomputed once per
    program (topology is loop-invariant; ~2.5 MB total at rb = 8, far
    under the ~16 MB VMEM).

Receptor (A) and ligand (B) tables stay separate throughout — trans
partners are always B, cis partners always A, ligand partners always A —
which shrinks the masks from [rb, n, n] to [rb, na, nb]/[rb, na, na]/
[rb, nb, na] blocks and avoids cross-table concatenation entirely.

Math is identical to ops/pallas_align.py (transcendental-free direction
vectors, half-angle quaternions; reference citations there: lay-down
main.cpp:1138-1193, trans seat :1313-1325, cis seat :1389-1401, B re-seat
:1438-1501).  The ligand template enters as Python-float constants (it is
a pure function of the static config).  Parity with the XLA idealize is
asserted in tests/test_pallas_align.py.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmc_tpu.config import SimConfig
from kmc_tpu.models.tnfr import (
    b_center_offset,
    cis_offsets,
    ligand_template,
    trans_offsets,
)

_INF = 30000.0

# replicas per grid step (see VMEM note in the module docstring)
RB = int(os.environ.get("KMC_ALIGN_RB", "8"))


def _mask(idx, n):
    """[rb, m] int32 -> [rb, m, n] f32 one-hot of clamped indices."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (*idx.shape, n), 2)
    return (jnp.clip(idx, 0, n - 1)[:, :, None] == jj).astype(jnp.float32)


def _g(mask, x):
    """mask [rb, m, n] one-hot, x [rb, n] -> x[b, idx[b, i]] as [rb, m]."""
    return jnp.sum(mask * x[:, None, :], axis=-1)


def _tab3(idx, v1, v2, v3):
    """Select python-float constants by idx [rb, m] in {1, 2, 3}."""
    out = jnp.where(idx == 2, jnp.float32(v2), jnp.float32(v1))
    return jnp.where(idx == 3, jnp.float32(v3), out)


def _quat_z_cs(dot, det):
    """(w, z) of the z-axis quaternion for α = atan2(det, dot) via
    half-angle identities (x = y = 0 for rotations about +z)."""
    r = jnp.maximum(jnp.sqrt(dot * dot + det * det), 1e-12)
    c = dot / r
    ch = jnp.sqrt(jnp.maximum((1.0 + c) * 0.5, 0.0))
    sh = jnp.sqrt(jnp.maximum((1.0 - c) * 0.5, 0.0))
    sh = jnp.where(det < 0, -sh, sh)
    return ch, sh


def _rot_const(qw, qx, qy, qz, vx, vy, vz):
    """Rotate the constant vector (vx, vy, vz) by per-element quaternions
    (component form of geometry.quat_rotate)."""
    tx = qy * vz - qz * vy
    ty = qz * vx - qx * vz
    tz = qx * vy - qy * vx
    ox = vx + 2.0 * (qw * tx + qy * tz - qz * ty)
    oy = vy + 2.0 * (qw * ty + qz * tx - qx * tz)
    oz = vz + 2.0 * (qw * tz + qx * ty - qy * tx)
    return ox, oy, oz


def _align_kernel_b(a_x_ref, a_y_ref, a_dx_ref, a_dy_ref,
                    b_cx_ref, b_cy_ref, b_cz_ref,
                    b_qw_ref, b_qx_ref, b_qy_ref, b_qz_ref,
                    a_trans_ref, a_site_ref, a_cis_ref,
                    bp0_ref, bp1_ref, bp2_ref,
                    b_laid_ref, ir_a_ref, ir_b_ref, act_a_ref, act_b_ref,
                    o_ax, o_ay, o_adx, o_ady, o_snap,
                    o_bcx, o_bcy, o_bcz, o_bqw, o_bqx, o_bqy, o_bqz,
                    o_blaid, *, cfg: SimConfig, tmpl: np.ndarray):
    na, nb = cfg.n_a, cfg.n_b
    ra = cfg.rb_a_radius
    t_off0 = float(trans_offsets(cfg)[0])
    c_off0 = float(cis_offsets(cfg)[0])
    seat_r = float(b_center_offset(cfg))
    plane_z = float(cfg.plane_z)

    a_x, a_y = a_x_ref[:], a_y_ref[:]           # [rb, na]
    a_dx, a_dy = a_dx_ref[:], a_dy_ref[:]
    b_cx, b_cy, b_cz = b_cx_ref[:], b_cy_ref[:], b_cz_ref[:]   # [rb, nb]
    b_qw, b_qx = b_qw_ref[:], b_qx_ref[:]
    b_qy, b_qz = b_qy_ref[:], b_qz_ref[:]
    a_trans = a_trans_ref[:]                    # [rb, na] i32 (global B idx)
    a_site = a_site_ref[:]                      # [rb, na] i32 (1..3 or -1)
    a_cis = a_cis_ref[:]                        # [rb, na] i32 (A idx)
    bp = [bp0_ref[:], bp1_ref[:], bp2_ref[:]]   # [rb, nb] i32 (A idx)
    b_laid = b_laid_ref[:]                      # [rb, nb] i32 0/1
    ir_a, ir_b = ir_a_ref[:], ir_b_ref[:]       # [rb, *] i32 0/1
    act_a = act_a_ref[:] == 1
    act_b = act_b_ref[:] == 1

    # ---- loop-invariant one-hot gather masks (topology is fixed) ----
    m_ab = _mask(a_trans - na, nb)              # A -> its trans B
    m_ac = _mask(a_cis, na)                     # A -> its cis A
    m_bp = [_mask(x, na) for x in bp]           # B -> its partner As

    # ---- BFS depth via min-propagation (A and B tables separate) ----
    v_trans = a_trans >= 0
    v_cis = a_cis >= 0
    v_bp = [x >= 0 for x in bp]
    depth_a = jnp.where(ir_a == 1, 0.0, _INF)
    depth_b = jnp.where(ir_b == 1, 0.0, _INF)
    for _ in range(cfg.align_depth):
        ga_t = jnp.where(v_trans, _g(m_ab, depth_b) + 1.0, _INF)
        ga_c = jnp.where(v_cis, _g(m_ac, depth_a) + 1.0, _INF)
        nda = jnp.minimum(depth_a, jnp.minimum(ga_t, ga_c))
        ndb = depth_b
        for c in range(3):
            gb = jnp.where(v_bp[c], _g(m_bp[c], depth_a) + 1.0, _INF)
            ndb = jnp.minimum(ndb, gb)
        depth_a, depth_b = nda, ndb

    # parent = first neighbor column at depth - 1 (column order = the
    # single kernel's: A cols (trans, cis); B cols (bp0, bp1, bp2))
    pd_t = jnp.where(v_trans, _g(m_ab, depth_b), _INF)
    pd_c = jnp.where(v_cis, _g(m_ac, depth_a), _INF)
    from_trans = pd_t == depth_a - 1.0
    from_cis = (~from_trans) & (pd_c == depth_a - 1.0)
    pd_b = [jnp.where(v_bp[c], _g(m_bp[c], depth_a), _INF) for c in range(3)]
    sel0 = pd_b[0] == depth_b - 1.0
    sel1 = (~sel0) & (pd_b[1] == depth_b - 1.0)
    sel2 = (~sel0) & (~sel1) & (pd_b[2] == depth_b - 1.0)
    parent_b = jnp.where(sel0, bp[0], jnp.where(sel1, bp[1],
                         jnp.where(sel2, bp[2], -1)))
    m_ba = _mask(parent_b, na)                  # B -> chosen parent A
    has_pb = parent_b >= 0

    # ---- root ligand lay-down in place ----
    root_b = (ir_b == 1) & act_b & (b_laid == 0)
    tx, ty, tz = (float(tmpl[1, 0, 0]), float(tmpl[1, 0, 1]),
                  float(tmpl[1, 0, 2]))
    bdx, bdy, _ = _rot_const(b_qw, b_qx, b_qy, b_qz, tx, ty, tz)
    dot0 = tx * bdx + ty * bdy
    det0 = tx * bdy - ty * bdx
    qw0, qz0 = _quat_z_cs(dot0, det0)
    zero = jnp.zeros_like(b_qw)
    b_qw = jnp.where(root_b, qw0, b_qw)
    b_qx = jnp.where(root_b, zero, b_qx)
    b_qy = jnp.where(root_b, zero, b_qy)
    b_qz = jnp.where(root_b, qz0, b_qz)
    b_cz = jnp.where(root_b, plane_z, b_cz)
    b_laid_new = jnp.where(root_b, 1, b_laid)

    # ---- per-site template vectors as constant tables (a_site in 1..3) ----
    sj = jnp.clip(a_site, 1, 3)
    svx = _tab3(sj, tmpl[1, 1, 0], tmpl[2, 1, 0], tmpl[3, 1, 0])
    svy = _tab3(sj, tmpl[1, 1, 1], tmpl[2, 1, 1], tmpl[3, 1, 1])
    svz = _tab3(sj, tmpl[1, 1, 2], tmpl[2, 1, 2], tmpl[3, 1, 2])
    bvx = _tab3(sj, tmpl[1, 0, 0], tmpl[2, 0, 0], tmpl[3, 0, 0])
    bvy = _tab3(sj, tmpl[1, 0, 1], tmpl[2, 0, 1], tmpl[3, 0, 1])
    bvz = _tab3(sj, tmpl[1, 0, 2], tmpl[2, 0, 2], tmpl[3, 0, 2])
    # B's ghost-bead direction: template bead of the site its PARENT binds
    pj = jnp.clip(_g(m_ba, a_site.astype(jnp.float32)).astype(jnp.int32),
                  1, 3)
    ghx = _tab3(pj, tmpl[1, 0, 0], tmpl[2, 0, 0], tmpl[3, 0, 0])
    ghy = _tab3(pj, tmpl[1, 0, 1], tmpl[2, 0, 1], tmpl[3, 0, 1])

    a_snap = jnp.zeros_like(a_trans)

    for d in range(1, cfg.align_depth + 1):
        dd = float(d)
        # --- A children ---
        sel_t = act_a & (depth_a == dd) & from_trans
        sel_c = act_a & (depth_a == dd) & from_cis
        # A <- B trans seat
        qpw, qpx = _g(m_ab, b_qw), _g(m_ab, b_qx)
        qpy, qpz = _g(m_ab, b_qy), _g(m_ab, b_qz)
        cpx, cpy = _g(m_ab, b_cx), _g(m_ab, b_cy)
        # rotate per-A site/bead template vectors by the parent quaternion
        # (variable vector: same cross-product expansion, vector per elem)
        def rot_var(vx, vy, vz):
            txx = qpy * vz - qpz * vy
            tyy = qpz * vx - qpx * vz
            tzz = qpx * vy - qpy * vx
            ox = vx + 2.0 * (qpw * txx + qpy * tzz - qpz * tyy)
            oy = vy + 2.0 * (qpw * tyy + qpz * txx - qpx * tzz)
            return ox, oy
        sx, sy = rot_var(svx, svy, svz)
        bx, by = rot_var(bvx, bvy, bvz)
        bsx, bsy = cpx + sx, cpy + sy
        utx = bsx - (cpx + bx)
        uty = bsy - (cpy + by)
        un = jnp.maximum(jnp.sqrt(utx * utx + uty * uty), 1e-9)
        utx, uty = utx / un, uty / un
        xt_x, xt_y = bsx + t_off0 * utx, bsy + t_off0 * uty
        dt_x, dt_y = -utx, -uty
        # A <- A cis seat
        uxp, uyp = _g(m_ac, a_dx), _g(m_ac, a_dy)
        xc_x = _g(m_ac, a_x) - ra * uxp - c_off0 * uxp
        xc_y = _g(m_ac, a_y) - ra * uyp - c_off0 * uyp
        a_x = jnp.where(sel_t, xt_x, jnp.where(sel_c, xc_x, a_x))
        a_y = jnp.where(sel_t, xt_y, jnp.where(sel_c, xc_y, a_y))
        a_dx = jnp.where(sel_t, dt_x, jnp.where(sel_c, -uxp, a_dx))
        a_dy = jnp.where(sel_t, dt_y, jnp.where(sel_c, -uyp, a_dy))
        a_snap = jnp.where(sel_t | sel_c, 1, a_snap)

        # --- B children (parent is always an A; reads this round's A) ---
        sel_b = act_b & (depth_b == dd) & has_pb
        ux2, uy2 = _g(m_ba, a_dx), _g(m_ba, a_dy)
        cx2 = _g(m_ba, a_x) + (ra + seat_r) * ux2
        cy2 = _g(m_ba, a_y) + (ra + seat_r) * uy2
        dotb = ghx * (-ux2) + ghy * (-uy2)
        detb = ghx * (-uy2) - ghy * (-ux2)
        qwb, qzb = _quat_z_cs(dotb, detb)
        b_cx = jnp.where(sel_b, cx2, b_cx)
        b_cy = jnp.where(sel_b, cy2, b_cy)
        b_cz = jnp.where(sel_b, plane_z, b_cz)
        b_qw = jnp.where(sel_b, qwb, b_qw)
        b_qx = jnp.where(sel_b, zero, b_qx)
        b_qy = jnp.where(sel_b, zero, b_qy)
        b_qz = jnp.where(sel_b, qzb, b_qz)
        b_laid_new = jnp.where(sel_b, 1, b_laid_new)

    # unreached markers (chain deeper than align_depth): a_snap = 2,
    # b_laid bit 1 — decoded by align_core into the dirty flag (see the
    # single-replica kernel's comment in ops/pallas_align.py)
    unr_a = act_a & (ir_a == 0) & (depth_a >= _INF)
    a_snap = jnp.where(unr_a, 2, a_snap)
    unr_b = act_b & (ir_b == 0) & (depth_b >= _INF)
    b_laid_new = jnp.where(unr_b, b_laid_new + 2, b_laid_new)

    o_ax[:] = a_x
    o_ay[:] = a_y
    o_adx[:] = a_dx
    o_ady[:] = a_dy
    o_snap[:] = a_snap
    o_bcx[:] = b_cx
    o_bcy[:] = b_cy
    o_bcz[:] = b_cz
    o_bqw[:] = b_qw
    o_bqx[:] = b_qx
    o_bqy[:] = b_qy
    o_bqz[:] = b_qz
    o_blaid[:] = b_laid_new


def align_core_batched(a_xy, a_dir, b_center, b_quat, a_trans, a_site,
                       a_cis, b_partner, b_laid, is_root, act, tmpl,
                       cfg: SimConfig, interpret=None, rb=None):
    """Batched fused idealize core over a leading replica axis B.

    Same call signature as the AoS version used by pallas_align._core_for;
    this wrapper splits components in XLA (free), pads B to a multiple of
    ``rb`` with inactive replicas (act = 0 -> identity), and restacks the
    kernel's SoA outputs.  ``tmpl`` is accepted for API compatibility but
    the kernel re-derives the template from the static config.
    Returns (a_xy, a_dir, a_snap, b_center, b_quat, b_laid)."""
    del tmpl
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    with jax.ensure_compile_time_eval():
        tmpl_np = np.asarray(jax.device_get(ligand_template(cfg)),
                             np.float32)
    rb = rb or RB
    na, nb = cfg.n_a, cfg.n_b
    b = a_xy.shape[0]
    rb = min(rb, b)
    pad = (-b) % rb
    bp_ = b + pad

    def padb(x):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0
        )

    i32 = jnp.int32
    args = [padb(x) for x in (
        a_xy[..., 0], a_xy[..., 1], a_dir[..., 0], a_dir[..., 1],
        b_center[..., 0], b_center[..., 1], b_center[..., 2],
        b_quat[..., 0], b_quat[..., 1], b_quat[..., 2], b_quat[..., 3],
        a_trans.astype(i32), a_site.astype(i32), a_cis.astype(i32),
        b_partner[..., 0].astype(i32), b_partner[..., 1].astype(i32),
        b_partner[..., 2].astype(i32),
        b_laid.astype(i32), is_root[:, :na].astype(i32),
        is_root[:, na:].astype(i32), act[:, :na].astype(i32),
        act[:, na:].astype(i32),
    )]

    def spec(m):
        return pl.BlockSpec((rb, m), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    shapes_in = [na, na, na, na, nb, nb, nb, nb, nb, nb, nb,
                 na, na, na, nb, nb, nb, nb, na, nb, na, nb]
    shapes_out = [na, na, na, na, na, nb, nb, nb, nb, nb, nb, nb, nb]
    dtypes_out = ([jnp.float32] * 4 + [i32]
                  + [jnp.float32] * 7 + [i32])
    outs = pl.pallas_call(
        functools.partial(_align_kernel_b, cfg=cfg, tmpl=tmpl_np),
        grid=(bp_ // rb,),
        in_specs=[spec(m) for m in shapes_in],
        out_specs=tuple(spec(m) for m in shapes_out),
        out_shape=tuple(
            jax.ShapeDtypeStruct((bp_, m), dt)
            for m, dt in zip(shapes_out, dtypes_out)
        ),
        interpret=interpret,
    )(*args)
    if pad:
        outs = tuple(o[:b] for o in outs)
    (ax, ay, adx, ady, snap, bcx, bcy, bcz, bqw, bqx, bqy, bqz,
     blaid) = outs
    return (
        jnp.stack([ax, ay], axis=-1),
        jnp.stack([adx, ady], axis=-1),
        snap,
        jnp.stack([bcx, bcy, bcz], axis=-1),
        jnp.stack([bqw, bqx, bqy, bqz], axis=-1),
        blaid,
    )
