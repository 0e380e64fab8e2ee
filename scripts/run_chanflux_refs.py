#!/usr/bin/env python
"""Stage 1 of the low-rate channel-flux probe (VERDICT r3 #2): run only the
instrumented reference side (N concurrent CPU processes) so the ours side can
later reuse them on TPU via  chan_flux.py --reuse-refs.

Usage: python scripts/run_chanflux_refs.py --boost 3 --steps 300000 \
           --ref-runs 6 --workdir /tmp/chanflux_b3 --preformed 8
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300000)
    ap.add_argument("--out-every", type=int, default=1000)
    ap.add_argument("--boost", type=float, default=3.0)
    ap.add_argument("--ref-runs", type=int, default=6)
    ap.add_argument("--workdir", default="/tmp/chanflux_b3")
    ap.add_argument("--preformed", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import chan_flux as cf
    import mini_golden as mg

    cfg = mg.our_config(args.boost).replace(out_every=args.out_every)
    pre = cf.build_preformed(cfg, args.preformed) if args.preformed else None
    cf.run_refs(args.workdir, args.steps, args.boost, args.ref_runs,
                args.out_every, cpt_state=pre, cfg=cfg)
    print("refs done", flush=True)


if __name__ == "__main__":
    main()
