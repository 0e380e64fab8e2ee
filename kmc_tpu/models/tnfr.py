"""TNF receptor / ligand rigid-body model geometry.

Builders for the two molecule species of the reference (SURVEY.md §0):

* receptor (protein A): a vertical 4-bead rod, bead radius 20 A, each bead
  carrying reference points (center, +x, -x, +z)  (main.cpp:298-315);
* ligand (protein B): an equilateral 3-bead trimer of radius-30 A beads
  plus a virtual center bead, each bead carrying (center, outward site)
  (main.cpp:386-412).

All builders are batched: a leading axis of molecule indices (or replicas)
broadcasts through.  They produce the ``pos`` layout documented in state.py.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.geometry import apply_rotation, euler_matrix, rot_z


def receptor_template(cfg: SimConfig):
    """Canonical receptor at origin: f32[4, 4, 3] (bead, point, xyz).

    Bead j center at z = 2*R*j; +x/-x sites at x = +-R; +z marker at
    center + R*z  (main.cpp:298-315 with 0-based beads/points).
    """
    r = cfg.rb_a_radius
    beads = []
    for j in range(4):
        z = 2.0 * r * j
        beads.append(
            [
                [0.0, 0.0, z],        # point 0: center
                [r, 0.0, z],          # point 1: +x (trans site on bead 2)
                [-r, 0.0, z],         # point 2: -x (cis site on bead 2)
                [0.0, 0.0, z + r],    # point 3: +z orientation marker
            ]
        )
    return jnp.asarray(beads, jnp.float32)


def ligand_template(cfg: SimConfig):
    """Canonical ligand trimer at origin: f32[4, 4, 3]; unused points zero.

    Bead 0 = virtual center (point 1 = up-site at +z*R); beads 1..3 at the
    vertices of an equilateral triangle, arm 2R/sqrt(3), with outward sites
    R beyond each bead center (main.cpp:386-412).  This is also the "ghost"
    template used for lay-down re-seating (main.cpp:1156-1179).
    """
    r = cfg.rb_b_radius
    arm = cfg.trimer_arm
    s3 = math.sqrt(3.0)
    z = 0.0
    pts = [
        [
            [0.0, 0.0, z],                       # virtual center
            [0.0, 0.0, z + r],                   # up-site (bonding-angle ref)
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ],
        [
            [0.0, arm, z],                       # bead 1 center
            [0.0, arm + r, z],                   # bead 1 outward site
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ],
        [
            [-r, -arm / 2.0, z],                 # bead 2 center (-R, -R/sqrt3)
            [-r * (s3 / 2.0 + 1.0), -arm / 2.0 - r / 2.0, z],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ],
        [
            [r, -arm / 2.0, z],                  # bead 3 center
            [r * (s3 / 2.0 + 1.0), -arm / 2.0 - r / 2.0, z],
            [0.0, 0.0, 0.0],
            [0.0, 0.0, 0.0],
        ],
    ]
    return jnp.asarray(pts, jnp.float32)


def build_receptors(center_xy, psai, cfg: SimConfig):
    """Receptor bodies: center_xy (..., 2), psai (...,) -> (..., 4, 4, 3).

    Translation to (x, y, 0) then rotation about the rod's own z-axis
    (main.cpp:328-350; rotating each bead's points about the bead center is
    identical to rotating about the rod axis since the rotation is z-only).
    """
    tmpl = receptor_template(cfg)                       # [4,4,3]
    rot = rot_z(psai)                                   # (...,3,3)
    flat = tmpl.reshape(16, 3)
    rotated = apply_rotation(rot, jnp.broadcast_to(flat, psai.shape + (16, 3)),
                             jnp.zeros(psai.shape + (3,), jnp.float32))
    body = rotated.reshape(psai.shape + (4, 4, 3))
    center = jnp.concatenate(
        [center_xy, jnp.zeros(center_xy.shape[:-1] + (1,), center_xy.dtype)],
        axis=-1,
    )
    return body + center[..., None, None, :]


def build_ligands(center, theta, phi, psai, cfg: SimConfig):
    """Ligand bodies: center (..., 3), Euler angles (...,) -> (..., 4, 4, 3).

    Full 3D rotation about the virtual center (main.cpp:421-446)."""
    tmpl = ligand_template(cfg)
    rot = euler_matrix(theta, phi, psai)
    flat = tmpl.reshape(16, 3)
    rotated = apply_rotation(rot, jnp.broadcast_to(flat, psai.shape + (16, 3)),
                             jnp.zeros(psai.shape + (3,), jnp.float32))
    body = rotated.reshape(psai.shape + (4, 4, 3))
    return body + center[..., None, None, :]


# --------------------------------------------------------------------------
# Ideal bond frames, used by the idealization pass (engine/align.py).
# Derived from the reference's snap formulas:
#   trans: main.cpp:1313-1325  (A seated colinearly behind the B site)
#   cis:   main.cpp:786-798, 1389-1401
#   B re-seat distance: main.cpp:1491-1494

def trans_offsets(cfg: SimConfig):
    """Multipliers m such that an ideally trans-bonded A has
    point p at  B_site + m[p] * u,  u = (B_site - B_bead_center)/R_B.

    Order: (center, +x site, -x site, +z marker) = points 0..3."""
    b2 = cfg.bond_dist_cutoff / 2.0
    ra = cfg.rb_a_radius
    return (b2 + ra, b2, b2 + 2.0 * ra, b2 + ra)


def cis_offsets(cfg: SimConfig):
    """Multipliers m such that an ideally cis-bonded partner A2 has
    point p at  A1_cis_site + m[p] * u,  u = (A1_cis_site - A1_center)/R_A."""
    c2 = cfg.cis_dist_cutoff / 2.0
    ra = cfg.rb_a_radius
    return (c2 + ra, c2 + 2.0 * ra, c2, c2 + ra)


def b_center_offset(cfg: SimConfig):
    """Distance from an A's trans site to the re-seated B virtual center
    along u = (A_site - A_center)/R_A  (main.cpp:1491)."""
    return cfg.bond_dist_cutoff / 2.0 + cfg.trimer_arm + cfg.rb_b_radius
