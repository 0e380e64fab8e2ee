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
  clusters  — cluster-size-distribution comparison: parse the reference
              cluster.log frames (main.cpp:2291-2305 — one line per
              ligand-seeded BFS row, token count = cluster size), histogram
              them, and compare each frame's histogram against the ensemble's
              per-replica cluster_histogram band, plus a distribution-level
              total-variation check on the time-averaged tail.
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
import time

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


def read_cluster_log(path, max_size):
    """Parse a reference cluster.log into (times, hist[frames, max_size+1]):
    each frame is one 'Hello Cluster!, t=...' header followed by one line per
    ligand (empty line = ligand already visited by an earlier BFS row; token
    count = cluster size, sizes >= max_size binned into the last slot), the
    exact layout of main.cpp:2291-2305."""
    times, hists = [], []
    cur = None
    with open(path) as f:
        for line in f:
            if line.startswith("Hello Cluster!"):
                if cur is not None:
                    hists.append(cur)
                times.append(float(line.split("t=")[1]))
                cur = np.zeros(max_size + 1, dtype=np.int64)
                continue
            if cur is None:
                continue
            n = len(line.split())
            if n:
                cur[min(n, max_size)] += 1
    if cur is not None:
        hists.append(cur)
    return np.asarray(times), np.asarray(hists)


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


KIN_COLS = ["bond_rl", "bond_mono_cis", "bond_cis", "bond_num"]


def _run_ensemble(args, n_out, with_hist, on_progress=None):
    """Advance an ensemble n_out output intervals; returns
    (kin[col] -> [n_out, replicas], hist[n_out, replicas, S+1] or None).
    ``on_progress(k, kin_partial, hists_partial)`` fires every 10 outputs —
    used to write partial reports so a timeout still leaves evidence.

    With ``args.init_cpt`` the ensemble starts from a REFERENCE
    position.cpt broadcast to all replicas (anchor continuation); with
    ``args.write_outputs`` replica 0's full reference-compatible output
    file set (bond.dat / test.gro / cluster.log / position.cpt + ensemble
    series) is written as the run progresses — the engine producing the
    reference's complete deliverable while it is being validated."""
    import jax

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import (
        init_ensemble, make_ensemble_chunk, make_ensemble_chunk_hist)

    cfg = SimConfig()
    lazy = getattr(args, "align_mode", "eager") == "lazy"
    if lazy:
        from kmc_tpu.parallel.ensemble import (
            make_lazy_ensemble_chunk, make_lazy_ensemble_chunk_hist)

        maker = (make_lazy_ensemble_chunk_hist if with_hist
                 else make_lazy_ensemble_chunk)
    else:
        maker = make_ensemble_chunk_hist if with_hist else make_ensemble_chunk
    # one output interval = several device programs: a single 5000-step
    # scan at 256 replicas runs ~165 s on-device, long enough to trip the
    # tunnel worker's execution watchdog ("TPU worker process crashed or
    # restarted", observed twice at r3 validation launch).  ~15 s programs
    # are safe (round-2 ran ~60 s ones).
    sub = max(int(getattr(args, "sub_chunks", 10)), 1)
    assert cfg.out_every % sub == 0, (cfg.out_every, sub)
    chunk = maker(cfg, cfg.out_every // sub, donate=True)
    if getattr(args, "init_cpt", None):
        from kmc_tpu.io.checkpoint import load_reference_cpt
        from kmc_tpu.parallel.ensemble import broadcast_ensemble

        anchor = load_reference_cpt(args.init_cpt, cfg)
        print(f"# anchor continuation from {args.init_cpt} at step "
              f"{int(anchor.step)}", file=sys.stderr, flush=True)
        state = broadcast_ensemble(anchor, args.replicas, seed=args.seed)
    else:
        state = init_ensemble(cfg, args.replicas, seed=args.seed)

    # ---- stall insurance: the TPU tunnel worker can restart mid-run and
    # leave the client hung forever (observed r4); persist (state, series)
    # every output so a kill+restart resumes at the last completed output
    # instead of recomputing hours of horizon ----
    sf = getattr(args, "state_file", None)
    k0 = 0
    kin = {c: [] for c in KIN_COLS}
    hists = []
    if sf and os.path.exists(sf) and getattr(args, "resume_state", False):
        import jax.numpy as jnp

        z = np.load(sf)
        k0 = int(z["k_done"])
        leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(int(z["n_leaf"]))]
        import jax as _jax

        treedef = _jax.tree.structure(state)
        # key leaf was saved as raw key data; rewrap
        flat0 = _jax.tree.leaves(state)
        leaves = [
            _jax.random.wrap_key_data(l) if _jax.dtypes.issubdtype(
                f0.dtype, _jax.dtypes.prng_key) else l
            for l, f0 in zip(leaves, flat0)
        ]
        state = _jax.tree.unflatten(treedef, leaves)
        for ci, c in enumerate(KIN_COLS):
            kin[c] = list(z["kin"][:, ci])
        if z["hists"].ndim == 3:
            hists = list(z["hists"])
        print(f"# resumed at output {k0}/{n_out} from {sf}",
              file=sys.stderr, flush=True)

    def save_state(k_done, st):
        if not sf:
            return
        import jax as _jax

        leaves = _jax.tree.leaves(st)
        arrs = {}
        for i, l in enumerate(leaves):
            if _jax.dtypes.issubdtype(l.dtype, _jax.dtypes.prng_key):
                l = _jax.random.key_data(l)
            arrs[f"leaf{i}"] = np.asarray(l)
        arrs["n_leaf"] = np.asarray(len(leaves))
        arrs["k_done"] = np.asarray(k_done)
        arrs["kin"] = np.stack([np.stack(kin[c], 0) for c in KIN_COLS], 1) \
            if kin[KIN_COLS[0]] else np.zeros((0, 4, 0))
        arrs["hists"] = np.stack(hists) if hists else np.zeros((0,))
        tmp = sf + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrs)
        os.replace(tmp, sf)

    writer = None
    if getattr(args, "write_outputs", None):
        from kmc_tpu.io.writers import EnsembleOutputSet

        writer = EnsembleOutputSet(args.write_outputs, cfg, fresh=(k0 == 0))

    t_wall0 = time.perf_counter()
    for k in range(k0, n_out):
        for _ in range(sub):
            state, out = chunk(state)
        obs, hist = out if with_hist else (out, None)
        for c in KIN_COLS:
            kin[c].append(np.asarray(getattr(obs, c)))
        if hist is not None:
            hists.append(np.asarray(hist))
        if writer is not None:
            writer(state, obs)
        save_state(k + 1, state)
        if (k + 1) % 10 == 0:
            rate = ((k + 1 - k0) * cfg.out_every
                    / (time.perf_counter() - t_wall0))
            print(f"# ensemble output {k + 1}/{n_out} "
                  f"({rate:,.0f} steps/s horizon rate)", file=sys.stderr,
                  flush=True)
            if on_progress is not None:
                on_progress(k + 1, {c: np.stack(v) for c, v in kin.items()},
                            np.stack(hists) if hists else None)
    jax.block_until_ready(state)
    if writer is not None:
        writer.close()
    kin = {c: np.stack(v) for c, v in kin.items()}
    return kin, (np.stack(hists) if hists else None)


def _kinetics_report(kin, ref, args):
    """Per-column quantile-band coverage of the single reference trajectory
    within the ensemble's predictive band, with a binomial-tail acceptance
    threshold instead of a flat cutoff: with nominal band mass (2q-1), the
    observed inside-fraction over n_out (autocorrelated, so conservative
    effective n = n_out/5) must not be improbably low (p > 1e-3)."""
    from math import comb

    q = args.quantile
    n_out = len(ref)
    report = {"n_out": n_out, "replicas": args.replicas, "quantile": q,
              "columns": {}}
    ok_all = True
    for ci, c in enumerate(KIN_COLS):
        samples = kin[c][:n_out]                     # [n_out, replicas]
        refv = ref[:n_out, 1 + ci]
        lo = np.quantile(samples, 1 - q, axis=1)
        hi = np.quantile(samples, q, axis=1)
        inside = (refv >= lo - 1e-9) & (refv <= hi + 1e-9)
        frac = float(np.mean(inside))
        # binomial lower tail at effective sample size (lag-5 decorrelation)
        n_eff = max(n_out // 5, 1)
        k_eff = int(round(frac * n_eff))
        p_nom = 2 * q - 1
        p_tail = sum(comb(n_eff, k) * p_nom**k * (1 - p_nom) ** (n_eff - k)
                     for k in range(k_eff + 1))
        mean_err = float(np.mean(np.abs(refv - samples.mean(1))))
        signed_err = float(np.mean(refv - samples.mean(1)))
        ok = frac >= args.min_coverage and p_tail > 1e-3
        ok_all &= ok
        report["columns"][c] = {
            "coverage": frac,
            "binomial_tail_p": float(p_tail),
            "mean_abs_err_vs_ensemble_mean": mean_err,
            "mean_signed_err_ref_minus_ours": signed_err,
            "ok": ok,
        }
    report["ok"] = bool(ok_all)
    return report


def _clusters_report(hist_ens, ref_hists, args):
    """Cluster-size-distribution comparison (the BASELINE north-star target):
    (a) per-(time, size-bin) quantile-band coverage of the reference
    histogram counts, and (b) a distribution-level check — total-variation
    distance between the reference's tail-time-averaged size distribution
    and the ensemble mean distribution must not exceed the 99th percentile
    of the replicas' own TV distances from that mean (i.e. the reference
    must look like one more replica)."""
    n_out = min(len(ref_hists), len(hist_ens))
    ens = hist_ens[:n_out].astype(np.float64)        # [n_out, reps, S+1]
    ref = ref_hists[:n_out].astype(np.float64)

    q = args.quantile
    lo = np.quantile(ens, 1 - q, axis=1)
    hi = np.quantile(ens, q, axis=1)
    inside = (ref >= lo - 1e-9) & (ref <= hi + 1e-9)
    coverage = float(np.mean(inside))

    tail = slice(n_out // 2, n_out)                  # steady-state half
    def tv(p, m):
        return 0.5 * np.sum(np.abs(p - m), axis=-1)

    def norm(h):
        s = h.sum(axis=-1, keepdims=True)
        return h / np.maximum(s, 1e-12)

    ref_dist = norm(ref[tail].mean(axis=0))          # [S+1]
    rep_dists = norm(ens[tail].mean(axis=0))         # [reps, S+1]
    mean_dist = rep_dists.mean(axis=0)
    ref_tv = float(tv(ref_dist, mean_dist))
    rep_tv = tv(rep_dists, mean_dist)
    tv_thresh = float(np.quantile(rep_tv, 0.99))

    ok = coverage >= args.min_coverage and ref_tv <= max(tv_thresh, 1e-6)
    return {
        "n_out": n_out,
        "bin_coverage": coverage,
        "ref_tv_vs_ensemble_mean": ref_tv,
        "replica_tv_p99": tv_thresh,
        "ref_tail_dist": [round(float(x), 4) for x in ref_dist],
        "ens_tail_dist": [round(float(x), 4) for x in mean_dist],
        "ok": bool(ok),
    }


def cmd_kinetics(args):
    """Kinetics (+ optional clusters) validation against one or MORE
    independent reference trajectories (each wall-clock-seeded run is its
    own realization; every one must sit inside the ensemble band)."""
    paths = args.ref_bond if isinstance(args.ref_bond, list) else \
        [args.ref_bond]
    refs = [read_bond_dat(p) for p in paths]
    for p, r in zip(paths, refs):
        if r.size == 0:
            sys.exit(f"reference bond.dat is empty: {p}")

    skip = 0
    anchor_t = None
    if getattr(args, "init_cpt", None):
        # anchor continuation: the cpt's final token is the saved step
        # (main.cpp:2243); our ensemble resumes there, so only oracle rows
        # AFTER the anchor time are comparable
        anchor_step = int(open(args.init_cpt).read().split()[-1])
        from kmc_tpu.config import SimConfig as _SC

        anchor_t = anchor_step * _SC().time_step
        skip = int(np.sum(refs[0][:, 0] <= anchor_t + 1e-6))
        for r in refs[1:]:
            assert int(np.sum(r[:, 0] <= anchor_t + 1e-6)) == skip, \
                "oracle runs disagree on anchor row (different cadences?)"
        print(f"# anchor t={anchor_t:.0f} ns -> skipping {skip} oracle rows",
              file=sys.stderr, flush=True)
        refs = [r[skip:] for r in refs]
    if args.max_rows:
        refs = [r[: args.max_rows] for r in refs]
    n_out = min(len(r) for r in refs)
    refs = [r[:n_out] for r in refs]

    from kmc_tpu.engine.observables import MAX_HIST_SIZE

    cpaths = args.ref_cluster or []
    if isinstance(cpaths, str):
        cpaths = [cpaths]
    ref_hists = []
    for p in cpaths:
        _, h = read_cluster_log(p, MAX_HIST_SIZE)
        ref_hists.append(h[skip: skip + n_out])

    def build_report(kin, hist_ens, k_avail):
        report = {"ref_runs": paths, "kinetics_runs": [], "n_out": k_avail}
        if anchor_t is not None:
            report["anchor"] = {"cpt": args.init_cpt, "t_ns": anchor_t,
                                "skipped_rows": skip}
        ok = True
        for r in refs:
            rep = _kinetics_report(kin, r[:k_avail], args)
            report["kinetics_runs"].append(rep)
            ok &= rep["ok"]
        if ref_hists and hist_ens is not None:
            report["clusters_runs"] = []
            for h in ref_hists:
                rep = _clusters_report(hist_ens, h[:k_avail], args)
                report["clusters_runs"].append(rep)
                ok &= rep["ok"]
        report["ok"] = bool(ok)
        return report

    def on_progress(k, kin_p, hists_p):
        if not args.out:
            return
        rep = build_report(kin_p, hists_p, k)
        rep["partial"] = True
        tmp = args.out + ".partial.tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(rep, indent=1) + "\n")
        os.replace(tmp, args.out + ".partial")

    kin, hist_ens = _run_ensemble(args, n_out, with_hist=bool(ref_hists),
                                  on_progress=on_progress)
    report = build_report(kin, hist_ens, n_out)
    ok = report["ok"]
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")
    return 0 if ok else 1


def cmd_msd(args):
    from kmc_tpu.config import SimConfig

    cfg = SimConfig()
    box = (cfg.cell_range_x, cfg.cell_range_y)
    t_ref, ref_frames = read_gro_centers(args.ref_gro, cfg.n_a, cfg.n_b)
    if args.ref_t0 is not None or args.ref_t1 is not None:
        t0 = args.ref_t0 if args.ref_t0 is not None else -np.inf
        t1 = args.ref_t1 if args.ref_t1 is not None else np.inf
        m = (t_ref >= t0) & (t_ref <= t1)
        t_ref, ref_frames = t_ref[m], ref_frames[m]
    if args.tail_frac:
        # fit over the trailing window only (steady binding state), with
        # displacements re-zeroed at the window start — so a reference
        # trajectory deep into binding saturation is compared like-for-like
        # against a continuation run that STARTS saturated.
        k = max(int(len(t_ref) * (1 - args.tail_frac)), 0)
        t_ref, ref_frames = t_ref[k:], ref_frames[k:]
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
    ok = True
    if mo is not None and len(to) > 1:
        our_slope = float(np.polyfit(to[1:] / cfg.time_step, mo[1:], 1)[0])
        report["our_msd_per_step"] = our_slope
        report["our_vs_analytic"] = our_slope / slope
        if "ref_msd_per_step" in report:
            r = our_slope / report["ref_msd_per_step"]
            report["our_vs_ref"] = r
            ok = bool(abs(r - 1.0) <= args.rtol)
            report["rtol"] = args.rtol
            report["ok"] = ok
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")
    return 0 if ok else 1


def main():
    from kmc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    k = sub.add_parser("kinetics")
    k.add_argument("--ref-bond", required=True, nargs="+",
                   help="one or more reference bond.dat trajectories")
    k.add_argument("--ref-cluster", default=None, nargs="*",
                   help="reference cluster.log(s); adds the cluster-size-"
                        "distribution comparison to the same run")
    k.add_argument("--replicas", type=int, default=64)
    k.add_argument("--seed", type=int, default=0)
    k.add_argument("--quantile", type=float, default=0.995)
    k.add_argument("--min-coverage", type=float, default=0.9)
    k.add_argument("--max-rows", type=int, default=0,
                   help="compare only the first N reference outputs")
    k.add_argument("--sub-chunks", type=int, default=10,
                   help="device programs per output interval (watchdog-"
                        "safe program duration)")
    k.add_argument("--align-mode", choices=("eager", "lazy"),
                   default="eager",
                   help="'lazy' runs the event-driven alignment ensemble "
                        "(bench.py's default mode) — validates the lazy "
                        "approximation at ship scale")
    k.add_argument("--init-cpt", default=None,
                   help="start every replica from this REFERENCE "
                        "position.cpt (anchor continuation) and compare "
                        "only oracle rows after the anchor time")
    k.add_argument("--write-outputs", default=None,
                   help="write replica 0's full reference-compatible "
                        "output file set + ensemble series to this dir "
                        "while validating")
    k.add_argument("--state-file", default=None,
                   help="persist (ensemble state, series) here every "
                        "output — stall insurance for the TPU tunnel")
    k.add_argument("--resume-state", action="store_true",
                   help="resume from --state-file if it exists")
    k.add_argument("--out", default=None, help="also write the report here")
    m = sub.add_parser("msd")
    m.add_argument("--ref-gro", required=True)
    m.add_argument("--our-gro", default=None)
    m.add_argument("--ref-t0", type=float, default=None,
                   help="restrict reference frames to t >= this (ns)")
    m.add_argument("--ref-t1", type=float, default=None,
                   help="restrict reference frames to t <= this (ns)")
    m.add_argument("--tail-frac", type=float, default=0.0,
                   help="fit the reference slope over only the last FRAC of "
                        "frames (steady binding state, for comparing against "
                        "a checkpoint-continuation run)")
    m.add_argument("--rtol", type=float, default=0.25,
                   help="pass threshold on |our/ref - 1| when both given")
    m.add_argument("--out", default=None, help="also write the report here")
    args = ap.parse_args()
    if args.mode == "kinetics":
        sys.exit(cmd_kinetics(args))
    sys.exit(cmd_msd(args))


if __name__ == "__main__":
    main()
