"""Checkpoint / resume (components C6 + C21 of SURVEY.md §2, §5).

Two formats:

* **native** — atomic .npz of the full state pytree including the RNG key
  and running counters.  Unlike the reference's truncate-in-place rewrite
  (main.cpp:2207, which can corrupt the only checkpoint if killed
  mid-write), the native writer writes to a temp file and renames.
  Bitwise-exact resume.
* **reference text** (``position.cpt``) — the exact fixed-point layout of
  main.cpp:2206-2244 / reader :226-270, so states interchange with the C++
  code.  %.3f coordinates make this resume path inexact by <=5e-4 A, the
  same bound as the reference's own resume (SURVEY §3.5).  Reading
  reconstructs poses from coordinates: receptor azimuth from its +x site,
  ligand quaternion refit from bead axes.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.observables import bond_counters
from kmc_tpu.state import SimState, empty_state, positions


# ---------------------------------------------------------------------------
# native atomic checkpoint

def save_native(path: str, state: SimState) -> None:
    arrays = {f: np.asarray(v) for f, v in state._asdict().items() if f != "key"}
    arrays["key_data"] = np.asarray(jax.random.key_data(state.key))
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_native(path: str) -> SimState:
    z = np.load(path)
    key = jax.random.wrap_key_data(jnp.asarray(z["key_data"]))
    fields = {f: jnp.asarray(z[f])
              for f in SimState._fields if f != "key" and f in z}
    # checkpoints written before the dirty flag: force one idealize pass
    fields.setdefault("dirty", jnp.ones(fields["step"].shape, bool))
    return SimState(key=key, **fields)


# ---------------------------------------------------------------------------
# reference-compatible text checkpoint

def save_reference_cpt(path: str, state: SimState, cfg: SimConfig) -> None:
    p = np.asarray(positions(state, cfg))
    na, nb = cfg.n_a, cfg.n_b
    a_trans = np.asarray(state.a_trans)
    a_site = np.asarray(state.a_site)
    a_cis = np.asarray(state.a_cis)
    b_partner = np.asarray(state.b_partner)
    rl, mono, cis, total = (int(x) for x in bond_counters(state, cfg))

    lines = []
    for i in range(na):
        for j in range(4):
            for k in range(4):
                x, y, z = p[i, j, k]
                lines.append(f"{x:>10.3f}{y:>10.3f}{z:>10.3f}")
        status2 = 1 if a_trans[i] >= 0 else 0
        status3 = 1 if a_cis[i] >= 0 else 0
        nei2 = int(a_trans[i]) + 1 if a_trans[i] >= 0 else 0
        nei4 = int(a_site[i]) + 1 if a_site[i] >= 0 else 0  # ref bead 2..4
        nei3 = int(a_cis[i]) + 1 if a_cis[i] >= 0 else 0
        lines.append(f"{status2:>8}{status3:>8}{nei2:>8}{nei4:>8}{nei3:>8}")
    for b in range(nb):
        i = na + b
        for j in range(4):
            for k in range(2):
                x, y, z = p[i, j, k]
                lines.append(f"{x:>10.3f}{y:>10.3f}{z:>10.3f}")
            if j == 0:
                lines.append(f"{0:>8}{0:>8}")
            else:
                bound = b_partner[b, j - 1] >= 0
                lines.append(
                    f"{1 if bound else 0:>8}"
                    f"{int(b_partner[b, j - 1]) + 1 if bound else 0:>8}"
                )
    lines += [
        str(total),
        str(rl),
        str(cis),
        str(mono),
        str(int(state.max_complex)),
        str(int(state.step) - 1),
    ]
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _quat_from_mat(m: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), numerically safe."""
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
             (m[1, 0] - m[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q


def load_reference_cpt(path: str, cfg: SimConfig, seed: int = 0) -> SimState:
    with open(path) as f:
        toks = f.read().split()
    it = iter(toks)

    def nxt_f():
        return float(next(it))

    def nxt_i():
        return int(next(it))

    na, nb = cfg.n_a, cfg.n_b
    a_xy = np.zeros((na, 2), np.float32)
    a_psi = np.zeros((na,), np.float32)
    a_trans = np.full((na,), -1, np.int32)
    a_site = np.full((na,), -1, np.int32)
    a_cis = np.full((na,), -1, np.int32)
    for i in range(na):
        coords = np.array(
            [[nxt_f(), nxt_f(), nxt_f()] for _ in range(16)]
        ).reshape(4, 4, 3)
        a_xy[i] = coords[0, 0, :2]
        d = coords[2, 1, :2] - coords[2, 0, :2]      # +x site direction
        a_psi[i] = np.arctan2(d[1], d[0])
        status2, status3, nei2, nei4, nei3 = (nxt_i() for _ in range(5))
        if status2:
            a_trans[i] = nei2 - 1
            a_site[i] = nei4 - 1
        if status3:
            a_cis[i] = nei3 - 1

    b_center = np.zeros((nb, 3), np.float32)
    b_quat = np.zeros((nb, 4), np.float32)
    b_laid = np.zeros((nb,), bool)
    b_partner = np.full((nb, 3), -1, np.int32)
    b_mirrored = np.zeros((nb,), bool)
    arm = cfg.trimer_arm
    rb = cfg.rb_b_radius
    from kmc_tpu.models.tnfr import ligand_template

    tmpl_b = np.asarray(ligand_template(cfg))    # hoisted (ADVICE r3)
    for b in range(nb):
        coords = np.zeros((4, 2, 3))
        stats = []
        for j in range(4):
            for k in range(2):
                coords[j, k] = [nxt_f(), nxt_f(), nxt_f()]
            stats.append((nxt_i(), nxt_i()))
        center = coords[0, 0]
        b_center[b] = center
        yv = (coords[1, 0] - center) / arm           # template bead1 = +y
        zv = (coords[0, 1] - center) / rb            # up-site = +z
        xv = np.cross(yv, zv)
        m = np.stack([xv, yv, zv], axis=1)           # columns = image axes
        # The reference's lay-down rebuild (main.cpp:1145-1190) projects the
        # trimer flat with a fixed planar winding; a ligand laid while facing
        # down comes out MIRRORED relative to the pristine template
        # (main.cpp:386-412) and keeps that chirality after dissociating.
        # A mirror through the template x=0 plane equals relabeling beads
        # 3<->4 (up-site and bead 2 fixed), so relabel and carry the partner
        # slots — identical physical state, proper rotation restored.
        # Chirality test: the frame above is anchored on bead 1 + up-site
        # only (its det is |yv x zv|^2, never negative), so mirroring shows
        # up as beads 3 and 4 sitting at each other's EXPECTED positions
        # (2*R_B = 60 A apart — robust against %.3f rounding).
        e2 = center + m @ tmpl_b[2, 0]
        e3 = center + m @ tmpl_b[3, 0]
        if (np.sum((coords[2, 0] - e2) ** 2)
                > np.sum((coords[2, 0] - e3) ** 2)):
            b_mirrored[b] = True
            coords[[2, 3]] = coords[[3, 2]]
            stats[2], stats[3] = stats[3], stats[2]
            # no frame rebuild needed: m never involved beads 3/4
        # orthonormalize against %.3f rounding (proper rotation enforced)
        u, _, vt = np.linalg.svd(m)
        sgn = np.sign(np.linalg.det(u @ vt))
        m = u @ np.diag([1.0, 1.0, sgn]) @ vt
        b_quat[b] = _quat_from_mat(m)
        b_laid[b] = (
            abs(coords[0, 1, 2] - (center[2] + rb)) < 1e-2
            and np.all(np.abs(coords[1:, 0, 2] - center[2]) < 1e-2)
        )
        for j in range(1, 4):
            status, nei = stats[j]
            if status:
                b_partner[b, j - 1] = nei - 1

    # the beads-3<->4 relabel of a mirrored ligand renames its partner
    # SLOTS, so receptors trans-bound to it must follow: a_site 2<->3
    # (otherwise topology_mutual breaks — a_site would point at the slot the
    # partner moved out of, and trans unbind would clear the wrong slot)
    for i in range(na):
        if a_trans[i] >= 0 and b_mirrored[a_trans[i] - na]:
            if a_site[i] == 2:
                a_site[i] = 3
            elif a_site[i] == 3:
                a_site[i] = 2

    total, rl, cis, mono, max_complex, step = (nxt_i() for _ in range(6))
    st = empty_state(cfg, jax.random.key(seed))
    return st._replace(
        a_xy=jnp.asarray(a_xy),
        a_psi=jnp.asarray(a_psi),
        b_center=jnp.asarray(b_center),
        b_quat=jnp.asarray(b_quat),
        a_trans=jnp.asarray(a_trans),
        a_site=jnp.asarray(a_site),
        a_cis=jnp.asarray(a_cis),
        b_partner=jnp.asarray(b_partner),
        b_laid=jnp.asarray(b_laid),
        max_complex=jnp.asarray(max_complex, jnp.int32),
        step=jnp.asarray(step + 1, jnp.int32),       # main.cpp:267 (+1)
    )
