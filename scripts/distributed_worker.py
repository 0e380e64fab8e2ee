#!/usr/bin/env python
"""One process of a multi-process ensemble run (SURVEY.md §4 "multi-process
simulation with jax.distributed.initialize on localhost ports").

Each process owns `--replicas-per-host` replicas (seeded by process index
via host_local_ensemble), joins the ('dp',) global mesh spanning all
processes' devices, advances the ensemble `--steps` steps SPMD, and
process 0 writes summary statistics.  tests/test_distributed.py launches
two of these on localhost and asserts the merged kinetics equal a single-
process run of the same replica blocks bitwise (collectives and vmapped
trajectories are deterministic).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")   # the container force-registers
#                                             the TPU backend; see CLAUDE.md


def _local_block(x):
    """This process's contiguous replica block of a ('dp',)-sharded global
    array, as numpy (shards ordered by global offset)."""
    import numpy as np

    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
        x = jax.random.key_data(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def save_sharded_checkpoint(out_dir, state, k_done):
    """Each process writes ITS OWN replica block (atomic rename) — no
    cross-host data movement, the sharded-checkpoint form of the single-
    process native npz (io/checkpoint.py).  Returns seconds spent."""
    import numpy as np

    t0 = time.perf_counter()
    pid = jax.process_index()
    leaves = jax.tree.leaves(state)
    arrs = {f"leaf{i}": _local_block(l) for i, l in enumerate(leaves)}
    arrs["k_done"] = np.asarray(k_done)
    path = os.path.join(out_dir, f"checkpoint.shard{pid}.npz")
    tmp = path + f".tmp{pid}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)
    return time.perf_counter() - t0


def load_sharded_checkpoint(out_dir, template):
    """Rebuild the global ensemble from this process's shard file, keeping
    the ('dp',) sharding (inverse of save_sharded_checkpoint)."""
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P

    from kmc_tpu.parallel.distributed import global_replica_mesh

    pid = jax.process_index()
    z = np.load(os.path.join(out_dir, f"checkpoint.shard{pid}.npz"))
    k_done = int(z["k_done"])
    mesh = global_replica_mesh()
    sharding = NamedSharding(mesh, P("dp"))
    flat, treedef = jax.tree.flatten(template)
    total = flat[0].shape[0]
    out = []
    for i, ref in enumerate(flat):
        data = z[f"leaf{i}"]
        if jax.dtypes.issubdtype(ref.dtype, jax.dtypes.prng_key):
            glob = jax.make_array_from_process_local_data(
                sharding, data, (total,) + data.shape[1:])
            out.append(jax.random.wrap_key_data(glob))
        else:
            out.append(jax.make_array_from_process_local_data(
                sharding, data, (total,) + data.shape[1:]))
    return jax.tree.unflatten(treedef, out), k_done


def run_e2e(args):
    """End-to-end multi-process production loop (VERDICT r4 #8): per output
    interval, advance out_every steps SPMD, collectively assemble the
    global kinetics row (mean/std/min/max per bond.dat column -> process 0
    appends bond_ens.dat), and write a sharded checkpoint — timing each
    phase so the MACHINERY cost a real slice would pay is measured, not
    assumed.  With --resume, continues from the shard files (the time axis
    must continue seamlessly)."""
    import numpy as np

    import jax.numpy as jnp

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.distributed import host_local_ensemble
    from kmc_tpu.parallel.ensemble import make_ensemble_chunk

    cfg = SimConfig(n_a=24, n_b=8, cell_range_x=2000.0, cell_range_y=2000.0,
                    cell_range_z=600.0, fused_align=False)
    pid = jax.process_index()
    os.makedirs(args.out_dir, exist_ok=True)
    # establish the Gloo pairs with a TINY collective before any big
    # compile: the per-process compile times of the step chunk skew the
    # processes by more than the transport connect timeout otherwise
    # (observed: "Gloo context initialization failed: Connect timeout")
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("kmc_e2e_start")
    state = host_local_ensemble(cfg, args.replicas_per_host, seed=args.seed)
    k0 = 0
    if args.resume:
        state, k0 = load_sharded_checkpoint(args.out_dir, state)

    chunk = make_ensemble_chunk(cfg, args.out_every, donate=True)
    COLS = ("bond_rl", "bond_mono_cis", "bond_cis", "bond_num",
            "cluster_size", "max_complex")

    @jax.jit
    def collect(obs):
        out = {"t": jnp.max(obs.time_ns)}
        for c in COLS:
            v = getattr(obs, c).astype(jnp.float32)
            out[c] = jnp.stack([jnp.mean(v), jnp.std(v), jnp.min(v),
                                jnp.max(v)])
        return out

    ens_path = os.path.join(args.out_dir, "bond_ens.dat")
    if k0 == 0 and pid == 0:
        with open(ens_path, "w") as f:
            f.write("# t_ns " + " ".join(
                f"{c}_mean {c}_std {c}_min {c}_max" for c in COLS) + "\n")

    t_step, t_collect, t_ckpt = [], [], []
    for k in range(k0, k0 + args.outputs):
        t0 = time.perf_counter()
        state, obs = chunk(state)
        jax.block_until_ready(state)
        t1 = time.perf_counter()
        row = collect(obs)
        row = {c: np.asarray(v) for c, v in row.items()}   # replicated pull
        t2 = time.perf_counter()
        if pid == 0:
            with open(ens_path, "a") as f:
                f.write(f"{float(row['t']):.3f} " + " ".join(
                    " ".join(f"{x:.4f}" for x in row[c]) for c in COLS)
                    + "\n")
        t_ckpt.append(save_sharded_checkpoint(args.out_dir, state, k + 1))
        t_step.append(t1 - t0)
        t_collect.append(t2 - t1)

    # interval 0 includes the jit compiles; report steady-state means
    ss = slice(1, None) if len(t_step) > 1 else slice(None)
    stats = {
        "nproc": args.nproc,
        "pid": pid,
        "replicas_global": args.replicas_per_host * args.nproc,
        "outputs": args.outputs,
        "out_every": args.out_every,
        "resumed_at": k0,
        "final_step": int(jax.device_get(jnp.max(state.step))),
        "first_interval_s_incl_compile": float(t_step[0] + t_collect[0]
                                               + t_ckpt[0]),
        "step_s_per_interval": float(np.mean(t_step[ss])),
        "collect_s_per_interval": float(np.mean(t_collect[ss])),
        "checkpoint_s_per_interval": float(np.mean(t_ckpt[ss])),
        "machinery_fraction": float(
            (np.mean(t_collect[ss]) + np.mean(t_ckpt[ss]))
            / max(np.mean(t_step[ss]) + np.mean(t_collect[ss])
                  + np.mean(t_ckpt[ss]), 1e-12)),
    }
    # every process reports; the runner aggregates
    with open(os.path.join(args.out_dir, f"timing.pid{pid}.json"), "w") as f:
        json.dump(stats, f)
    print(f"pid={pid} {stats}", flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicas-per-host", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bench-repeats", type=int, default=0,
                    help="after the warmup chunk, time this many more "
                         "chunks and report global replica-steps/s "
                         "(VERDICT r3 #7: the localhost 2-process "
                         "throughput point)")
    ap.add_argument("--e2e-out-dir", dest="out_dir", default=None,
                    help="run the end-to-end production loop (collective "
                         "bond_ens.dat + sharded checkpoints, per-phase "
                         "timing) into this directory instead")
    ap.add_argument("--outputs", type=int, default=4,
                    help="e2e: output intervals to run")
    ap.add_argument("--out-every", type=int, default=200,
                    help="e2e: steps per output interval")
    ap.add_argument("--resume", action="store_true",
                    help="e2e: resume from the sharded checkpoint files")
    args = ap.parse_args()

    # join the runtime BEFORE importing kmc_tpu: module-level jnp constants
    # would initialize the XLA backend, which must happen after initialize()
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{args.port}",
                               num_processes=args.nproc,
                               process_id=args.pid)
    assert jax.process_count() == args.nproc

    if args.out_dir:
        return run_e2e(args)

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.distributed import host_local_ensemble
    from kmc_tpu.parallel.ensemble import make_ensemble_chunk

    cfg = SimConfig(n_a=24, n_b=8, cell_range_x=2000.0, cell_range_y=2000.0,
                    cell_range_z=600.0, fused_align=False)
    state = host_local_ensemble(cfg, args.replicas_per_host, seed=args.seed)
    chunk = make_ensemble_chunk(cfg, args.steps, donate=True)
    state, obs = chunk(state)

    bench = None
    if args.bench_repeats:
        import time

        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(args.bench_repeats):
            state, obs = chunk(state)
        jax.block_until_ready(state)
        dt = time.perf_counter() - t0
        glob = args.replicas_per_host * args.nproc
        bench = {
            "nproc": args.nproc,
            "replicas_global": glob,
            "steps_timed": args.bench_repeats * args.steps,
            "replica_steps_per_s": glob * args.bench_repeats * args.steps / dt,
        }

    # fully-replicated reductions are addressable on every process
    import jax.numpy as jnp

    stats = jax.jit(
        lambda s, o: {
            "bond_sum": jnp.sum(o.bond_num),
            "xy_checksum": jnp.sum(s.a_xy.astype(jnp.float64)),
            "step": jnp.max(s.step),
        }
    )(state, obs)
    stats = {k: float(v) for k, v in stats.items()}
    stats["replicas_global"] = args.replicas_per_host * args.nproc
    if bench is not None:
        stats["bench"] = bench

    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(stats, f)
    print(f"pid={args.pid} {stats}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
