"""Command-line driver.

The reference has no CLI at all — parameters are compile-time constants and
the binary is run in a working directory (SURVEY.md §1 "no CLI layer").
This driver adds the missing layer: config from JSON + ``--set key=value``
overrides, output directory, resume (auto-detected from ``position.cpt`` in
the output directory, exactly like the reference's startup probe,
main.cpp:226-270, or from a native checkpoint).

Example::

    python -m kmc_tpu.cli --steps 100000 --out runs/ref \
        --set n_a=150 --set n_b=50 --seed 1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from kmc_tpu.config import SimConfig


def parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        k, v = p.split("=", 1)
        out[k] = v
    return out


def coerce(cfg_dict, overrides):
    for k, v in overrides.items():
        if k not in cfg_dict:
            raise SystemExit(f"unknown config key: {k}")
        cur = cfg_dict[k]
        try:
            if isinstance(cur, bool):
                cfg_dict[k] = v.lower() in ("1", "true", "yes")
            elif isinstance(cur, int):
                cfg_dict[k] = int(v)
            elif isinstance(cur, float):
                cfg_dict[k] = float(v)
            else:
                cfg_dict[k] = v
        except ValueError:
            raise SystemExit(
                f"invalid value for {k}: {v!r} (expected {type(cur).__name__})"
            )
    return cfg_dict


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kmc_tpu", description=__doc__)
    ap.add_argument("--config", help="JSON config file", default=None)
    ap.add_argument("--set", dest="sets", action="append",
                    help="override: key=value", default=[])
    ap.add_argument("--steps", type=int, default=None,
                    help="number of MC steps (default: cfg.simu_step)")
    ap.add_argument("--out", default="out", help="output directory")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--replicas", type=int, default=1,
                    help="trajectory-ensemble size (vmapped; >1 also writes "
                         "bond_ens.dat with mean/std kinetics)")
    ap.add_argument("--engine", choices=["particle", "lattice"],
                    default="particle",
                    help="particle: the reference-parity rigid-body engine; "
                         "lattice: the occupancy-grid engine (LatticeConfig "
                         "keys in --set; use --lattice-pallas for the fused "
                         "kernel)")
    ap.add_argument("--lattice-pallas", action="store_true",
                    help="lattice engine: use the fused Pallas TPU kernel")
    ap.add_argument("--lattice-rf", action="store_true",
                    help="lattice engine: rejection-free Gumbel-max event "
                         "selection (--steps counts EVENTS; continuous time "
                         "advances by Exp(1)/total_rate per event)")
    ap.add_argument("--out-every", type=int, default=None,
                    help="lattice engine output cadence (default 1000)")
    ap.add_argument("--resume", choices=["auto", "native", "reference", "none"],
                    default="auto")
    ap.add_argument("--platform", choices=["default", "cpu", "tpu"],
                    default="default",
                    help="force the JAX backend (this container force-"
                         "registers the TPU backend; --platform cpu makes "
                         "small runs local and instant)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.engine == "lattice":
        return run_lattice(args)

    cfg = SimConfig.from_json(args.config) if args.config else SimConfig()
    cfg = SimConfig.from_dict(coerce(cfg.to_dict(), parse_overrides(args.sets)))

    if args.replicas > 1:
        return run_ensemble(cfg, args)

    from kmc_tpu.engine.step import run
    from kmc_tpu.io.checkpoint import load_native, load_reference_cpt
    from kmc_tpu.io.writers import OutputSet
    from kmc_tpu.state import init_state

    native = os.path.join(args.out, "checkpoint.npz")
    ref_cpt = os.path.join(args.out, "position.cpt")
    state = None
    if args.resume in ("auto", "native") and os.path.exists(native):
        state = load_native(native)
        print(f"resuming from {native} at step {int(state.step)}")
    elif args.resume in ("auto", "reference") and os.path.exists(ref_cpt):
        state = load_reference_cpt(ref_cpt, cfg, args.seed)
        print(f"resuming from {ref_cpt} at step {int(state.step)}")
    fresh = state is None
    if fresh:
        state = init_state(cfg, args.seed)

    outputs = OutputSet(args.out, cfg, fresh=fresh)
    n_steps = args.steps if args.steps is not None else cfg.simu_step
    t0 = time.perf_counter()
    done = [0]

    def on_output(st, obs):
        from kmc_tpu.io.checkpoint import save_native

        outputs(st, obs)
        save_native(native, st)
        done[0] += cfg.out_every
        if not args.quiet:
            dt = time.perf_counter() - t0
            rate = done[0] / max(dt, 1e-9)
            print(
                f"step {int(st.step) - 1}  t={float(obs.time_ns):.0f}ns  "
                f"bonds={int(obs.bond_num)}  rate={rate:,.0f} steps/s",
                file=sys.stderr,
            )

    state = run(state, cfg, n_steps=n_steps, on_output=on_output)
    outputs.close()
    if not args.quiet:
        print(f"done at step {int(state.step) - 1}")
    return 0


def run_lattice(args) -> int:
    """Lattice-engine run (BASELINE configs 2/3): occupancy-grid diffusion-
    reaction with species histogram + MSD time series."""
    import os as _os
    import time as _time

    from kmc_tpu.config import LatticeConfig
    from kmc_tpu.lattice.grid import init_lattice
    from kmc_tpu.lattice.io import LatticeOutputSet, load_lattice
    from kmc_tpu.lattice.step import make_lattice_chunk

    lcfg = LatticeConfig.from_dict(
        coerce(LatticeConfig().to_dict(), parse_overrides(args.sets))
    )
    out_every = args.out_every or 1000
    ckpt = _os.path.join(args.out, "lattice_checkpoint.npz")
    state = None
    if args.resume in ("auto", "native") and _os.path.exists(ckpt):
        state = load_lattice(ckpt)
        print(f"resuming lattice from {ckpt} at step {int(state.step)}")
    fresh = state is None
    if fresh:
        state = init_lattice(lcfg, seed=args.seed)

    if args.lattice_rf:
        from kmc_tpu.lattice.rejection_free import make_rf_chunk

        chunk = make_rf_chunk(lcfg, out_every)
    elif args.lattice_pallas:
        from kmc_tpu.ops.pallas_lattice import make_pallas_lattice_chunk

        chunk = make_pallas_lattice_chunk(lcfg, out_every)
    else:
        chunk = make_lattice_chunk(lcfg, out_every)

    outputs = LatticeOutputSet(args.out, lcfg, fresh=fresh)
    n_steps = args.steps if args.steps is not None else 100_000
    t0 = _time.perf_counter()
    done = 0
    while done < n_steps:
        state = chunk(state)
        done += out_every
        outputs(state)
        if not args.quiet:
            rate = done / max(_time.perf_counter() - t0, 1e-9)
            print(f"lattice step {int(state.step)}  rate={rate:,.0f} steps/s",
                  file=sys.stderr)
    if not args.quiet:
        print(f"done at lattice step {int(state.step)}")
    return 0


def run_ensemble(cfg: SimConfig, args) -> int:
    """Replica-ensemble run (BASELINE config 4): vmapped trajectories on one
    chip (sharded over ('dp',) when multiple devices are visible), merged
    kinetics with error bars to bond_ens.dat."""
    import jax

    from kmc_tpu.io.checkpoint import load_native, save_native
    from kmc_tpu.io.writers import EnsembleOutputSet
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk
    from kmc_tpu.parallel.mesh import replica_mesh, shard_replicated_state

    native = os.path.join(args.out, "ensemble_checkpoint.npz")
    state = None
    if args.resume in ("auto", "native") and os.path.exists(native):
        state = load_native(native)
        print(f"resuming ensemble from {native} at step "
              f"{int(state.step[0])}")
    fresh = state is None
    if fresh:
        state = init_ensemble(cfg, args.replicas, seed=args.seed)
    if len(jax.devices()) > 1 and args.replicas % len(jax.devices()) == 0:
        state = shard_replicated_state(state, replica_mesh())

    outputs = EnsembleOutputSet(args.out, cfg, fresh=fresh)
    chunk = make_ensemble_chunk(cfg, cfg.out_every, donate=True)
    n_steps = args.steps if args.steps is not None else cfg.simu_step
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        state, obs = chunk(state)
        done += cfg.out_every
        outputs(state, obs)
        save_native(native, state)
        if not args.quiet:
            dt = time.perf_counter() - t0
            rate = done * args.replicas / max(dt, 1e-9)
            print(
                f"step {int(state.step[0]) - 1} x{args.replicas}  "
                f"rate={rate:,.0f} replica-steps/s",
                file=sys.stderr,
            )
    outputs.close()
    if not args.quiet:
        print(f"done at step {int(state.step[0]) - 1}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
