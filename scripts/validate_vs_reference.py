#!/usr/bin/env python
"""Statistical validation against the compiled C++ reference (SURVEY.md §7
stage 8: the reference is the golden oracle, compared seeds-in-distribution
— never bitwise, since its RNG is wall-clock-seeded per call).

Modes:
  kinetics  — compare a reference bond.dat against the predictive band of a
              vmapped replica ensemble run at identical parameters: for
              each output time and column, the reference value must fall
              inside the ensemble's [lo, hi] quantile band (a single
              trajectory against its own distribution).
  msd       — mean-squared-displacement curves extracted from test.gro
              trajectories (ours vs reference), compared to each other and
              to the analytic per-step displacement second moment
              E[dr^2] = 2 D dt / 9 implied by the reference's sampling
              (main.cpp:585, 909).

Usage:
  python scripts/validate_vs_reference.py kinetics --ref-bond /tmp/refgolden/bond.dat \
      --replicas 64 [--quantile 0.995]
  python scripts/validate_vs_reference.py msd --ref-gro /tmp/refgolden/test.gro
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_bond_dat(path):
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 7:
                rows.append([float(x) for x in parts])
    return np.asarray(rows)


def read_gro_centers(path, n_a, n_b):
    """Per-frame molecule reference positions from a test.gro file:
    receptors = first bead center; ligands = centroid of their 3 beads.
    Returns (times, pos[frames, n_a + n_b, 3]) in Angstrom."""
    times, frames = [], []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    natoms_expect = n_a * 4 + n_b * 3
    while i < len(lines):
        if not lines[i].startswith("Hello Gro!"):
            i += 1
            continue
        t = float(lines[i].split("t=")[1])
        natoms = int(lines[i + 1])
        if natoms != natoms_expect:
            raise ValueError(f"unexpected atom count {natoms}")
        block = lines[i + 2 : i + 2 + natoms]
        xyz = np.array(
            [[float(l[-24:-16]), float(l[-16:-8]), float(l[-8:])] for l in block]
        ) * 10.0                                   # nm -> Angstrom
        a = xyz[: n_a * 4].reshape(n_a, 4, 3)[:, 0]
        b = xyz[n_a * 4:].reshape(n_b, 3, 3).mean(axis=1)
        frames.append(np.concatenate([a, b]))
        times.append(t)
        i += 2 + natoms + 1
    return np.asarray(times), np.asarray(frames)


def unwrap(traj, box_xy):
    """Undo periodic jumps frame-to-frame (valid when per-frame motion << box)."""
    d = np.diff(traj, axis=0)
    for ax, box in enumerate(box_xy):
        d[..., ax] -= box * np.round(d[..., ax] / box)
    return np.concatenate([traj[:1], traj[:1] + np.cumsum(d, axis=0)], axis=0)


def msd_curve(times, frames, box_xy):
    un = unwrap(frames, box_xy)
    disp = un - un[0]
    return times - times[0], np.mean(np.sum(disp**2, axis=-1), axis=1)


def cmd_kinetics(args):
    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk

    ref = read_bond_dat(args.ref_bond)
    if ref.size == 0:
        sys.exit("reference bond.dat is empty")
    cfg = SimConfig()
    n_out = len(ref)
    chunk = make_ensemble_chunk(cfg, cfg.out_every, donate=True)
    state = init_ensemble(cfg, args.replicas, seed=args.seed)

    cols = ["bond_rl", "bond_mono_cis", "bond_cis", "bond_num"]
    ens = {c: [] for c in cols}
    import jax

    for _ in range(n_out):
        state, obs = chunk(state)
        for c in cols:
            ens[c].append(np.asarray(getattr(obs, c)))
    jax.block_until_ready(state)

    q = args.quantile
    report = {"n_out": n_out, "replicas": args.replicas, "columns": {}}
    ok_all = True
    for ci, c in enumerate(cols):
        samples = np.stack(ens[c])                   # [n_out, replicas]
        refv = ref[:n_out, 1 + ci]
        lo = np.quantile(samples, 1 - q, axis=1)
        hi = np.quantile(samples, q, axis=1)
        inside = (refv >= lo - 1e-9) & (refv <= hi + 1e-9)
        frac = float(np.mean(inside))
        mean_err = float(
            np.mean(np.abs(refv - samples.mean(1)))
        )
        ok = frac >= args.min_coverage
        ok_all &= ok
        report["columns"][c] = {
            "coverage": frac,
            "mean_abs_err_vs_ensemble_mean": mean_err,
            "ok": ok,
        }
    report["ok"] = bool(ok_all)
    print(json.dumps(report, indent=1))
    return 0 if ok_all else 1


def cmd_msd(args):
    from kmc_tpu.config import SimConfig

    cfg = SimConfig()
    box = (cfg.cell_range_x, cfg.cell_range_y)
    t_ref, ref_frames = read_gro_centers(args.ref_gro, cfg.n_a, cfg.n_b)
    tt, mm = msd_curve(t_ref, ref_frames, box)

    if args.our_gro:
        t_o, our_frames = read_gro_centers(args.our_gro, cfg.n_a, cfg.n_b)
        to, mo = msd_curve(t_o, our_frames, box)
    else:
        to = mo = None

    # analytic per-step second moment (mixture of species; diffusion-
    # dominated early times): E[dr^2]/step = 2*D*dt/9 each species
    w_a, w_b = cfg.n_a / cfg.n, cfg.n_b / cfg.n
    slope = (w_a * 2 * cfg.rb_a_d + w_b * 2 * cfg.rb_b_d) * cfg.time_step / 9
    report = {"ref_points": len(tt)}
    if len(tt) > 1:
        ref_slope = float(np.polyfit(tt[1:] / cfg.time_step, mm[1:], 1)[0])
        report["ref_msd_per_step"] = ref_slope
        report["analytic_msd_per_step"] = slope
        report["ref_vs_analytic"] = ref_slope / slope
    if mo is not None and len(to) > 1:
        our_slope = float(np.polyfit(to[1:] / cfg.time_step, mo[1:], 1)[0])
        report["our_msd_per_step"] = our_slope
        report["our_vs_analytic"] = our_slope / slope
    print(json.dumps(report, indent=1))
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    k = sub.add_parser("kinetics")
    k.add_argument("--ref-bond", required=True)
    k.add_argument("--replicas", type=int, default=64)
    k.add_argument("--seed", type=int, default=0)
    k.add_argument("--quantile", type=float, default=0.995)
    k.add_argument("--min-coverage", type=float, default=0.9)
    m = sub.add_parser("msd")
    m.add_argument("--ref-gro", required=True)
    m.add_argument("--our-gro", default=None)
    args = ap.parse_args()
    if args.mode == "kinetics":
        sys.exit(cmd_kinetics(args))
    sys.exit(cmd_msd(args))


if __name__ == "__main__":
    main()
