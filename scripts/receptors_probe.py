#!/usr/bin/env python
"""Receptors-only encounter probe (VERDICT r4 #3): measure the free-A PAIR
encounter rate (mono-cis eligibility flux, main.cpp:1952-2003) in a pure
receptor gas, decisively.

Design: NA = 40 receptors at the reference's area density (mini box), ONE
ligand (both engines; zero-size arrays break argmax reductions on our side,
and one ligand in a 2981^2 x 1000 box changes excluded-area statistics by
~1e-4 — negligible vs the 35% question), and ALL association rates set to
0.  Eligibility counters fire independently of the Bernoulli draw in both
engines (reference: ch_elig_mono++ at the Prob_Ass assignment,
instrumented; ours: jnp.sum(elig) in reactions.react), so with rate 0 the
probe counts raw geometric encounters of a stationary diffusing gas — no
kinetic feedback, no branching variance.  The round-4 2.6-sigma ambiguity
(CHAN_FLUX_r04_boost3: elig_mono ours/ref = 0.65 over 6 runs at full
kinetics) becomes a direct rate ratio with ~1-3% error bars.

Stages:
  refs   — patch (B=1, all Ass rates 0) + instrument + compile the
           reference, launch N detached niced runs, write pids.
  ours   — run a 256-replica ensemble on the default (TPU) backend,
           accumulate per-replica eligibility counters.
  report — combine into RECEPTORS_PROBE_r05.json with per-step rates,
           empirical SEs (across runs / replicas) and the ratio CI.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NB = 1          # see module docstring
REF_STEPS = 400_000
OUR_STEPS = 200_000
OUT_EVERY = 5_000


def probe_config():
    import mini_golden as mg

    return mg.our_config(1.0).replace(
        n_b=NB, ass_rate=0.0, mono_cis_ass_rate=0.0, cis_ass_rate=0.0,
        out_every=OUT_EVERY)


def patch_probe(src: str) -> str:
    import mini_golden as mg

    src = mg.patch_reference(src, REF_STEPS, 1.0, OUT_EVERY)
    subs = [
        (r"#define RB_B_tot_num \d+", f"#define RB_B_tot_num {4 * NB}"),
        (r"#define protein_B_tot_num \d+",
         f"#define protein_B_tot_num {NB}"),
        (r"#define protein_B_tot_num_matrix \d+",
         f"#define protein_B_tot_num_matrix {NB + 1}"),
        (r"#define protein_tot_num \d+",
         f"#define protein_tot_num {mg.NA + NB}"),
        (r"#define protein_tot_num_matrix \d+",
         f"#define protein_tot_num_matrix {mg.NA + NB + 1}"),
        (r"double Ass_Rate = [\d.e-]+;", "double Ass_Rate = 0.0;"),
        (r"double mono_cis_Ass_Rate = [\d.e-]+;",
         "double mono_cis_Ass_Rate = 0.0;"),
        (r"double cis_Ass_Rate = [\d.e-]+;", "double cis_Ass_Rate = 0.0;"),
    ]
    for pat, rep in subs:
        src, k = re.subn(pat + r"(?=\s*$|\s*//)", rep, src,
                         flags=re.MULTILINE)
        assert k >= 1, f"pattern not found: {pat}"
    return src


def cmd_refs(args):
    import mini_golden as mg

    os.makedirs(args.workdir, exist_ok=True)
    src = patch_probe(open("/root/reference/main.cpp").read())
    src = mg.instrument_reference(src)
    with open(os.path.join(args.workdir, "main.cpp"), "w") as f:
        f.write(src)
    exe = os.path.join(args.workdir, "mini_kmc")
    subprocess.run(["g++", "-O2", "-o", exe,
                    os.path.join(args.workdir, "main.cpp")], check=True)
    pids = []
    for r in range(args.ref_runs):
        rundir = os.path.join(args.workdir, f"run{r}")
        os.makedirs(rundir, exist_ok=True)
        for f_ in ("bond.dat", "position.cpt", "parameter.log", "chan.dat"):
            p = os.path.join(rundir, f_)
            if os.path.exists(p):
                os.remove(p)
        proc = subprocess.Popen(["nice", "-n", "5", exe], cwd=rundir,
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        pids.append(proc.pid)
    with open(os.path.join(args.workdir, "pids.txt"), "w") as f:
        f.write(" ".join(map(str, pids)) + "\n")
    print(f"launched {len(pids)} reference probes (pids {pids}); "
          f"{REF_STEPS} steps each, detached")


def cmd_ours(args):
    from kmc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from kmc_tpu.engine.step import step_fn_diag
    from kmc_tpu.parallel.ensemble import init_ensemble

    cfg = probe_config()

    @jax.jit
    def chunk(state):
        def inner(st, _):
            st2, obs, dg = jax.vmap(lambda s: step_fn_diag(s, cfg))(st)
            return st2, dg

        state, dg = jax.lax.scan(inner, state, None, length=OUT_EVERY)
        return state, {k: jnp.sum(v, axis=0) for k, v in dg.items()}

    state = init_ensemble(cfg, args.replicas, seed=args.seed)
    n_out = OUR_STEPS // OUT_EVERY
    acc = None
    import time
    t0 = time.perf_counter()
    for k in range(n_out):
        state, dg = chunk(state)
        dg = {k_: np.asarray(v) for k_, v in dg.items()}
        acc = dg if acc is None else {k_: acc[k_] + dg[k_] for k_ in dg}
        print(f"# ours {k + 1}/{n_out} "
              f"({(k + 1) * OUT_EVERY / (time.perf_counter() - t0):,.0f} "
              f"steps/s)", file=sys.stderr, flush=True)
    np.savez(os.path.join(args.workdir, "ours_elig.npz"),
             steps=np.asarray(OUR_STEPS), **acc)
    print(f"ours done: elig_mono mean/replica = "
          f"{acc['elig_mono'].mean():.1f} over {OUR_STEPS} steps")


def cmd_report(args):
    ref_rates = []
    ref_steps = []
    ref_tail_rates = []                 # last 75% only (init-transient check)
    for r in range(args.ref_runs):
        path = os.path.join(args.workdir, f"run{r}", "chan.dat")
        rows = np.loadtxt(path).reshape(-1, 12)
        # cumulative counters at the last completed output
        ref_rates.append(rows[-1, 2] / rows[-1, 0])          # elig_mono/step
        ref_steps.append(int(rows[-1, 0]))
        q = len(rows) // 4
        if q >= 1:
            ref_tail_rates.append((rows[-1, 2] - rows[q - 1, 2])
                                  / (rows[-1, 0] - rows[q - 1, 0]))
    ref_rates = np.asarray(ref_rates)
    z = np.load(os.path.join(args.workdir, "ours_elig.npz"))
    steps = int(z["steps"])
    ours = z["elig_mono"].astype(float) / steps              # per replica
    ref_mean, ref_se = ref_rates.mean(), ref_rates.std(ddof=1) / np.sqrt(
        len(ref_rates))
    our_mean, our_se = ours.mean(), ours.std(ddof=1) / np.sqrt(len(ours))
    ratio = our_mean / ref_mean
    # delta-method SE of the ratio
    rse = ratio * np.sqrt((ref_se / ref_mean) ** 2 + (our_se / our_mean) ** 2)
    report = {
        "design": "receptors-only stationary gas, all Ass rates 0, NA=40 "
                  "NB=1, mini box (reference area density); elig_mono "
                  "counts ordered free-A pairs passing the cis gates "
                  "(main.cpp:1952-2003) per step",
        "ref_runs": len(ref_rates),
        "ref_steps": ref_steps,
        "ref_rate_per_step": float(ref_mean),
        "ref_rate_se": float(ref_se),
        "ref_rates": [float(x) for x in ref_rates],
        "ref_tail75_rate_per_step": float(np.mean(ref_tail_rates))
        if ref_tail_rates else None,
        "our_replicas": len(ours),
        "our_steps": steps,
        "our_rate_per_step": float(our_mean),
        "our_rate_se": float(our_se),
        "ratio_ours_over_ref": float(ratio),
        "ratio_se": float(rse),
        "ratio_ci95": [float(ratio - 1.96 * rse), float(ratio + 1.96 * rse)],
        "verdict_ok": bool(abs(ratio - 1.0) <= 1.96 * rse + 0.05),
    }
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("stage", choices=("refs", "ours", "report"))
    ap.add_argument("--workdir", default="/tmp/rprobe")
    ap.add_argument("--ref-runs", type=int, default=12)
    ap.add_argument("--replicas", type=int, default=256)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.stage == "refs":
        cmd_refs(args)
    elif args.stage == "ours":
        cmd_ours(args)
    else:
        cmd_report(args)


if __name__ == "__main__":
    main()
