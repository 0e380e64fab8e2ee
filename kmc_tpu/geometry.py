"""Rigid-body geometry kernels (component C4 of SURVEY.md §2).

The reference inlines an Euler rotation-matrix expression at 8+ sites
(main.cpp:332-342, 613-623, 946-956, ...) and computes bond angles with
``gettheta`` (main.cpp:2329-2366).  Here each is a pure jnp function,
batched over arbitrary leading axes so a single call serves all molecules
of all replicas at once (VPU-friendly, no scalar loops).

All angles are radians internally; ``angle_between_deg`` returns degrees to
match the reference's gate conventions (main.cpp:1915, 1981).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# The reference uses pai = 3.1415926 for sampling (main.cpp:71) and
# 180/3.14159 for rad->deg (main.cpp:2353).  We use jnp.pi everywhere; the
# O(1e-8) difference is far below every statistical tolerance.


def euler_matrix(theta, phi, psai):
    """Rotation matrix with the reference's Euler convention (main.cpp:332-342).

    Accepts broadcastable arrays; returns shape ``(..., 3, 3)`` applied as
    ``p' = R @ (p - c) + c``.  With theta=phi=0 this is a rotation about z
    by ``psai`` (the in-plane case used for receptors and complexes).
    """
    theta, phi, psai = jnp.broadcast_arrays(
        jnp.asarray(theta), jnp.asarray(phi), jnp.asarray(psai)
    )
    ct, st = jnp.cos(theta), jnp.sin(theta)
    cf, sf = jnp.cos(phi), jnp.sin(phi)
    cp, sp = jnp.cos(psai), jnp.sin(psai)
    r00 = cp * cf - ct * sf * sp
    r01 = -sp * cf - ct * sf * cp
    r02 = st * sf
    r10 = cp * sf + ct * cf * sp
    r11 = -sp * sf + ct * cf * cp
    r12 = -st * cf
    r20 = sp * st
    r21 = cp * st
    r22 = ct
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_z(psai):
    """Rotation about z by ``psai`` — the euler_matrix(0, 0, psai) fast path."""
    return euler_matrix(jnp.zeros_like(jnp.asarray(psai)), 0.0, psai)


def apply_rotation(rot, points, center):
    """``R @ (points - center) + center`` batched.

    rot: (..., 3, 3); points: (..., K, 3); center: (..., 3).
    """
    center = center[..., None, :]
    return jnp.einsum("...ij,...kj->...ki", rot, points - center) + center


def angle_between_deg(u, v, eps=1e-12):
    """Angle in degrees between vectors u and v, acos-clamped.

    Matches the reference ``gettheta`` semantics (main.cpp:2329-2366): with
    the 3-point polyline (p0, origin, p2) the reference computes
    ``acos( (p0 . p2) / (|p0||p2|) )`` after clamping to [-1, 1] — i.e. the
    plain angle between the two difference vectors.  Callers pass u, v
    directly.  Broadcasts over leading axes; last axis is xyz.
    """
    nu = jnp.linalg.norm(u, axis=-1)
    nv = jnp.linalg.norm(v, axis=-1)
    c = jnp.sum(u * v, axis=-1) / jnp.maximum(nu * nv, eps)
    c = jnp.clip(c, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(c))


def angle_gate_above_deg(u, v, thresh_deg):
    """True where angle(u, v) > thresh_deg — the transcendental-free form of
    the reference's acos gates: theta > T  <=>  cos(theta) < cos(T)
    (cos is strictly decreasing on [0, 180]).  One sqrt per pair instead of
    an arccos; exactly equivalent at the gate boundary up to f32 rounding.
    """
    dot = jnp.sum(u * v, axis=-1)
    n2 = jnp.sum(u * u, axis=-1) * jnp.sum(v * v, axis=-1)
    c = math.cos(math.radians(thresh_deg))
    return dot < c * jnp.sqrt(n2)


def angle_gate_below_deg(u, v, thresh_deg):
    """True where angle(u, v) < thresh_deg (same construction)."""
    dot = jnp.sum(u * v, axis=-1)
    n2 = jnp.sum(u * u, axis=-1) * jnp.sum(v * v, axis=-1)
    c = math.cos(math.radians(thresh_deg))
    return dot > c * jnp.sqrt(n2)


def wrap_shift(coord, box):
    """Minimum-image shift for one coordinate: ``box * round(coord / box)``
    (main.cpp:597-598).  Subtract the result from the whole rigid body."""
    return box * jnp.round(coord / box)


def reflect_z(z, box_z):
    """Reference z reflection for ligands (main.cpp:925-931): when the body's
    center leaves [0, box_z], every point maps ``z -> -z + 2*box_z*round(zc/box_z)``
    where zc is the center z.  Returns the reflected z given the shift term.
    """
    return -z + 2.0 * wrap_shift(z, box_z)


# --------------------------------------------------------------------------
# Quaternions.  Ligand orientation is stored as a unit quaternion (state.py):
# deriving bead points from a canonical template each step keeps rigid bodies
# exactly rigid (no accumulated f32 drift), unlike carrying transformed
# coordinates as the reference does.  The reference Euler matrix factors as
# Rz(phi) @ Rx(theta) @ Rz(psai) (verified against main.cpp:332-342), so its
# quaternion is qz(phi) * qx(theta) * qz(psai).

def quat_identity(shape=()):
    q = jnp.zeros(shape + (4,), jnp.float32)
    return q.at[..., 0].set(1.0)


def quat_axis_z(angle):
    angle = jnp.asarray(angle, jnp.float32)
    h = angle / 2.0
    z = jnp.zeros_like(h)
    return jnp.stack([jnp.cos(h), z, z, jnp.sin(h)], axis=-1)


def quat_axis_x(angle):
    angle = jnp.asarray(angle, jnp.float32)
    h = angle / 2.0
    z = jnp.zeros_like(h)
    return jnp.stack([jnp.cos(h), jnp.sin(h), z, z], axis=-1)


def quat_mul(a, b):
    """Hamilton product; (w, x, y, z) layout; broadcasts."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_from_euler(theta, phi, psai):
    """Quaternion of the reference Euler convention Rz(phi)Rx(theta)Rz(psai)."""
    return quat_mul(quat_axis_z(phi), quat_mul(quat_axis_x(theta), quat_axis_z(psai)))


def mat3_apply(r, v):
    """Batched 3x3 matrix-vector product in explicit component form.

    ``jnp.einsum('...ij,...j->...i')`` with per-element 3x3 matrices lowers
    to a degenerate batched dot_general on TPU (tiny contraction per MXU
    tile); the expanded elementwise form runs on the VPU at full rate.
    r: (..., 3, 3); v: (..., 3).
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            r[..., 0, 0] * x + r[..., 0, 1] * y + r[..., 0, 2] * z,
            r[..., 1, 0] * x + r[..., 1, 1] * y + r[..., 1, 2] * z,
            r[..., 2, 0] * x + r[..., 2, 1] * y + r[..., 2, 2] * z,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4):
    v' = v + 2 w (u x v) + 2 u x (u x v), u = q.xyz — fully expanded into
    component arithmetic (jnp.cross lowers to concatenates that fragment
    TPU fusion; explicit components stay on the VPU)."""
    w = q[..., 0]
    ux, uy, uz = q[..., 1], q[..., 2], q[..., 3]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    # t = u x v
    tx = uy * vz - uz * vy
    ty = uz * vx - ux * vz
    tz = ux * vy - uy * vx
    # v' = v + 2 (w t + u x t)
    ox = vx + 2.0 * (w * tx + uy * tz - uz * ty)
    oy = vy + 2.0 * (w * ty + uz * tx - ux * tz)
    oz = vz + 2.0 * (w * tz + ux * ty - uy * tx)
    return jnp.stack([ox, oy, oz], axis=-1)


def quat_to_mat(q):
    """Rotation matrix (..., 3, 3) of a unit quaternion (w, x, y, z)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return r


def align_angle_2d(a, b, eps=1e-12):
    """CCW angle that rotates 2D vector ``a`` onto the direction of ``b``.

    The reference computes this for ligand re-seating via
    ``atan2(-det, -dot) + pi`` (main.cpp:1479-1486), which is identically
    ``atan2(det, dot)`` — the standard 2D alignment angle.  a, b: (..., 2).
    """
    dot = a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
    det = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
    return jnp.arctan2(det, dot + eps * (dot == 0))


def rot2d_apply(angle, xy):
    """Apply a CCW 2D rotation (main.cpp:1186-1187 layout): xy (..., K, 2)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x, y = xy[..., 0], xy[..., 1]
    return jnp.stack([x * c[..., None] - y * s[..., None],
                      x * s[..., None] + y * c[..., None]], axis=-1)
