#!/usr/bin/env python
"""Per-channel reaction-flux comparison vs an instrumented reference build.

Bisects kinetics-parity deviations (bond_cis, VALIDATION_r02b) one channel
at a time: for each of the six channels, compares the cumulative number of
*eligible* candidates (pairs/triples passing status+geometry gates, i.e.
encounter statistics produced by the diffusion/alignment engine) and of
*accepted* events (encounters x Bernoulli) between N instrumented reference
runs (scripts/mini_golden.instrument_reference) and a kmc_tpu replica
ensemble at the identical mini config.

Eligibility separates the hypotheses: if eligible-cis counts differ, the
bias lives in diffusion/alignment geometry; if eligibility matches but
acceptance doesn't, it lives in the reaction engine's matching.

Usage:
  python scripts/chan_flux.py --steps 100000 --replicas 24 --boost 10 \
      --ref-runs 2 --cpu --out CHAN_FLUX.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_COLS = ["step", "elig_trans", "elig_mono", "elig_cis", "acc_trans",
            "acc_mono", "acc_cis", "dis_trans", "dis_mono", "dis_cis",
            "re_up", "re_down"]


def build_preformed(cfg, n_complex=8):
    """Deterministic state with ``n_complex`` preformed idealized 1-ligand
    complexes (1/2/3 bound receptors cycling), remaining receptors free on
    a grid, remaining ligands free in the volume.  Written as position.cpt
    for the reference (it auto-resumes from it, main.cpp:226-270) and used
    directly by our ensemble — both engines start from the IDENTICAL
    configuration, so complex-cis encounter statistics are comparable
    within ~100k steps instead of waiting ~1M steps for complexes to form."""
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from helpers import ideal_trans_pair, place_receptor

    from kmc_tpu.state import empty_state
    import jax as _jax

    st = empty_state(cfg, _jax.random.key(0))
    na, nb = cfg.n_a, cfg.n_b
    lx, ly, lz = cfg.cell_range_x, cfg.cell_range_y, cfg.cell_range_z

    spacing = lx / 4.0
    a_used = 0
    for k in range(n_complex):
        m = (k % 3) + 1                       # 1, 2, 3 receptors
        cx = -lx / 2 + spacing * (0.5 + (k % 4))
        cy = -ly / 2 + spacing * (0.5 + (k // 4))
        alpha = 2.399963 * k                  # golden-angle azimuths
        for s in range(1, m + 1):
            st = ideal_trans_pair(st, a=a_used, b=k, site=s, cfg=cfg,
                                  center_xy=(cx, cy), alpha=alpha, bond=True)
            a_used += 1
    # free receptors on an offset grid (keeps everything far apart)
    n_free_a = na - a_used
    cols = 8
    for i in range(n_free_a):
        x = -lx / 2 + (lx / cols) * (0.5 + (i % cols))
        y = -ly / 2 + (ly / cols) * (0.5 + (i // cols)) + spacing / 2
        st = place_receptor(st, a_used + i, (x, y), 0.7 * i)
    # free ligands high in the volume
    for b in range(n_complex, nb):
        j = b - n_complex
        st = st._replace(b_center=st.b_center.at[b].set(jnp.asarray(
            [-lx / 2 + (lx / 4) * (0.5 + (j % 4)),
             -ly / 2 + (ly / 4) * (0.5 + (j // 4)),
             0.75 * lz], jnp.float32)))
    return st


def run_refs(workdir, steps, boost, n_runs, out_every, cpt_state=None,
             cfg=None):
    """Compile once, run n_runs instrumented references concurrently.
    With ``cpt_state``, each run starts by resuming our position.cpt
    (reference restore path, main.cpp:226-270)."""
    import mini_golden as mg

    os.makedirs(workdir, exist_ok=True)
    src = open("/root/reference/main.cpp").read()
    src = mg.patch_reference(src, steps, boost, out_every)
    src = mg.instrument_reference(src)
    with open(os.path.join(workdir, "main.cpp"), "w") as f:
        f.write(src)
    exe = os.path.join(workdir, "mini_kmc")
    subprocess.run(["g++", "-O2", "-o", exe, os.path.join(workdir, "main.cpp")],
                   check=True)
    procs = []
    for r in range(n_runs):
        rundir = os.path.join(workdir, f"run{r}")
        os.makedirs(rundir, exist_ok=True)
        for f_ in ("bond.dat", "position.cpt", "parameter.log", "chan.dat"):
            p = os.path.join(rundir, f_)
            if os.path.exists(p):
                os.remove(p)
        if cpt_state is not None:
            from kmc_tpu.io.checkpoint import save_reference_cpt

            save_reference_cpt(os.path.join(rundir, "position.cpt"),
                               cpt_state, cfg)
        procs.append(subprocess.Popen([exe], cwd=rundir,
                                      stdout=subprocess.DEVNULL,
                                      stderr=subprocess.DEVNULL))
    for p in procs:
        assert p.wait() == 0
    out = []
    for r in range(n_runs):
        rows = np.loadtxt(os.path.join(workdir, f"run{r}", "chan.dat"))
        out.append(rows.reshape(-1, len(REF_COLS)))
    return out


def ensemble_from_state(st, replicas, seed):
    """Broadcast one state to a replica ensemble with independent streams."""
    import jax
    import jax.numpy as jnp

    from kmc_tpu import rng

    keys = jax.vmap(
        lambda r: rng.replica_key(rng.base_key(seed), r)
    )(jnp.arange(replicas))
    bat = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (replicas, *x.shape)),
        st._replace(key=jnp.zeros((), jnp.int32)),  # placeholder, set below
    )
    return bat._replace(key=keys)


def run_ours(cfg, replicas, n_out, out_every, seed, init_state=None):
    import jax
    import jax.numpy as jnp

    from kmc_tpu.engine.step import step_fn_diag
    from kmc_tpu.parallel.ensemble import init_ensemble

    @jax.jit
    def chunk(state):
        def inner(st, _):
            st2, obs, dg = jax.vmap(
                lambda s: step_fn_diag(s, cfg))(st)
            return st2, (obs, dg)

        state, (obs, dg) = jax.lax.scan(inner, state, None, length=out_every)
        # cumulative within chunk: sum over steps; per replica
        dg_sum = {k: jnp.sum(v, axis=0) for k, v in dg.items()}
        last = jax.tree.map(lambda x: x[-1], obs)
        return state, last, dg_sum

    if init_state is not None:
        state = ensemble_from_state(init_state, replicas, seed)
    else:
        state = init_ensemble(cfg, replicas, seed=seed)
    acc = None
    series = []
    for k in range(n_out):
        state, obs, dg = chunk(state)
        dg = {k_: np.asarray(v) for k_, v in dg.items()}
        acc = dg if acc is None else {k_: acc[k_] + dg[k_] for k_ in dg}
        series.append({k_: acc[k_].copy() for k_ in acc})
        if (k + 1) % 10 == 0:
            print(f"# ours {k + 1}/{n_out}", file=sys.stderr, flush=True)
    return series  # list over outputs of dict[channel] -> [replicas]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=100000)
    ap.add_argument("--out-every", type=int, default=1000)
    ap.add_argument("--replicas", type=int, default=24)
    ap.add_argument("--boost", type=float, default=10.0)
    ap.add_argument("--ref-runs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/chanflux")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--preformed", type=int, default=0,
                    help="start both engines from N preformed complexes")
    ap.add_argument("--max-out", type=int, default=0,
                    help="cap the compared output rows (ours-side runtime)")
    ap.add_argument("--reuse-refs", action="store_true",
                    help="parse existing runN/chan.dat instead of re-running "
                         "the reference (ours-side-only iteration)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kmc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import mini_golden as mg

    cfg = mg.our_config(args.boost).replace(out_every=args.out_every)
    pre = build_preformed(cfg, args.preformed) if args.preformed else None

    if args.reuse_refs:
        refs = []
        for r in range(args.ref_runs):
            rows = np.loadtxt(os.path.join(args.workdir, f"run{r}",
                                           "chan.dat"))
            refs.append(rows.reshape(-1, len(REF_COLS)))
    else:
        refs = run_refs(args.workdir, args.steps, args.boost, args.ref_runs,
                        args.out_every, cpt_state=pre, cfg=cfg)
    n_out = min(r.shape[0] for r in refs)
    if args.max_out:
        n_out = min(n_out, args.max_out)
    print(f"# reference: {len(refs)} runs x {n_out} outputs", file=sys.stderr)

    ours = run_ours(cfg, args.replicas, n_out, args.out_every, args.seed,
                    init_state=pre)

    report = {"config": {"steps": args.steps, "boost": args.boost,
                         "replicas": args.replicas,
                         "ref_runs": args.ref_runs},
              "channels": {}}
    name_map = {c: c for c in REF_COLS[1:]}
    for c in ["elig_trans", "elig_mono", "elig_cis",
              "acc_trans", "acc_mono", "acc_cis", "dis_trans"]:
        ref_final = [float(r[n_out - 1, REF_COLS.index(name_map[c])])
                     for r in refs]
        our_final = ours[n_out - 1][c].astype(float)
        report["channels"][c] = {
            "ref_runs_final": ref_final,
            "ours_mean_final": float(our_final.mean()),
            "ours_std_final": float(our_final.std()),
            "ours_min": float(our_final.min()),
            "ours_max": float(our_final.max()),
            "ratio_mean_vs_refmean": (
                float(our_final.mean() / np.mean(ref_final))
                if np.mean(ref_final) else None),
        }
    # reference-only reclassification fluxes for context
    for c in ["re_up", "re_down", "dis_mono", "dis_cis"]:
        report["channels"].setdefault("ref_extra", {})[c] = [
            float(r[n_out - 1, REF_COLS.index(c)]) for r in refs]
    # time series at quarter points for trend reading
    qs = [n_out // 4, n_out // 2, 3 * n_out // 4, n_out - 1]
    report["quarters"] = {}
    for c in ["elig_cis", "acc_cis", "elig_mono", "acc_mono"]:
        report["quarters"][c] = {
            "ref_mean": [float(np.mean([r[q, REF_COLS.index(c)]
                                        for r in refs])) for q in qs],
            "ours_mean": [float(ours[q][c].mean()) for q in qs],
        }
    txt = json.dumps(report, indent=1)
    print(txt)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt + "\n")


if __name__ == "__main__":
    main()
