#!/usr/bin/env python
"""Capture a jax.profiler trace of the lazy ensemble chunk (bench.py's
mode) and dump the per-HLO-op time table, so optimization targets are
measured instead of guessed (VERDICT r3 #3).

Usage: python scripts/trace_step_tpu.py [--replicas 512] [--chunk 50]
"""
import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--logdir", default="/tmp/kmc_trace")
    ap.add_argument("--mode", default="lazy", choices=("lazy", "eager"))
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import (
        init_ensemble, make_ensemble_chunk, make_lazy_ensemble_chunk)

    cfg = SimConfig()
    state = jax.block_until_ready(init_ensemble(cfg, args.replicas, seed=0))
    if args.mode == "lazy":
        chunk = make_lazy_ensemble_chunk(cfg, args.chunk,
                                         k_align=max(args.replicas // 8, 32),
                                         donate=True)
    else:
        chunk = make_ensemble_chunk(cfg, args.chunk, donate=True)
    state, _ = chunk(state)                              # compile+warm
    state = jax.block_until_ready(state)
    print("# warm; tracing", file=sys.stderr, flush=True)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        state, _ = chunk(state)
        state = jax.block_until_ready(state)

    # ---- parse the captured trace into an op table ----
    # primary path: the Chrome trace JSON via scripts/parse_trace_json.py
    # (tensorboard_plugin_profile's protobuf bindings are broken in this
    # image — "Descriptors cannot be created directly"; observed r5)
    jpaths = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    if jpaths:
        import subprocess

        subprocess.run([sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "parse_trace_json.py"), jpaths[-1]])
        return

    paths = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime)
    xp = paths[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xp], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    out = os.path.join(args.logdir, "hlo_stats.json")
    with open(out, "w") as f:
        f.write(data)
    tbl = json.loads(data)
    # gviz table: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
    print("# columns:", cols, file=sys.stderr)

    def col(name_part):
        for i, c in enumerate(cols):
            if name_part.lower() in str(c).lower():
                return i
        return None

    i_cat = col("category")
    i_name = col("hlo op name") or col("op name")
    i_time = col("total time") if col("total time") is not None else col(
        "avg. time")
    i_self = col("self time")
    rows = []
    for r in tbl["rows"]:
        c = [x.get("v") if x else None for x in r["c"]]
        rows.append(c)
    key = i_self if i_self is not None else i_time
    rows.sort(key=lambda c: -(c[key] or 0))
    total = sum(c[key] or 0 for c in rows)
    print(f"# total {total:.1f} (column: {cols[key]}); top {args.top}:")
    for c in rows[: args.top]:
        frac = 100.0 * (c[key] or 0) / max(total, 1e-9)
        nm = str(c[i_name])[:110] if i_name is not None else "?"
        cat = str(c[i_cat])[:28] if i_cat is not None else "?"
        print(f"{frac:5.2f}%  {cat:28s} {nm}")


if __name__ == "__main__":
    main()
