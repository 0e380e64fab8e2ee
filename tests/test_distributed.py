"""Single-process paths of the multi-host helpers (the same code paths that
run under jax.distributed on a pod; process_count==1 here)."""

import numpy as np

import jax

from kmc_tpu.parallel.distributed import (
    all_hosts_mean,
    global_replica_mesh,
    host_local_ensemble,
    initialize,
)
from kmc_tpu.parallel.ensemble import make_ensemble_step


def test_initialize_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("KMC_COORDINATOR", raising=False)
    initialize()                                   # must not raise


def test_host_local_ensemble_is_global_sharded(small_cfg):
    st = host_local_ensemble(small_cfg, replicas_per_host=8)
    mesh = global_replica_mesh()
    assert st.a_xy.shape[0] == 8
    assert set(st.a_xy.sharding.device_set) == set(mesh.devices.flat)
    step = make_ensemble_step(small_cfg, donate=False)
    st2, obs = step(st)
    jax.block_until_ready(st2)
    assert st2.a_xy.shape == st.a_xy.shape


def test_all_hosts_mean_identity():
    x = np.arange(8.0)
    out = all_hosts_mean(x)
    np.testing.assert_allclose(np.asarray(out), x)


def test_two_process_localhost_matches_single(tmp_path, small_cfg):
    """TRUE multi-process run: two localhost processes join via
    jax.distributed.initialize (Gloo CPU collectives), advance a global
    ('dp',)-sharded ensemble, and the merged kinetics must equal a single-
    process run over the same replica blocks (trajectories are replica-
    independent and collectives deterministic, so equality is exact)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    import jax.numpy as jnp

    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk

    steps, rph = 30, 4
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "scripts", "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out = os.path.join(tmp_path, "dist.json")

    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--pid", str(p), "--nproc", "2",
             "--port", str(port), "--out", out,
             "--replicas-per-host", str(rph), "--steps", str(steps)],
            env=env, cwd=root,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    got = json.load(open(out))
    assert got["replicas_global"] == 2 * rph

    # single-process expectation: the same two seed blocks, concatenated
    # (host_local_ensemble seeds block p with seed*nproc+p)
    cfg = SimConfig(n_a=24, n_b=8, cell_range_x=2000.0, cell_range_y=2000.0,
                    cell_range_z=600.0, fused_align=False)
    chunk = make_ensemble_chunk(cfg, steps, donate=False)
    bond_sum, xy_sum = 0.0, 0.0
    for block_seed in (0, 1):
        st, obs = chunk(init_ensemble(cfg, rph, seed=block_seed))
        bond_sum += float(jnp.sum(obs.bond_num))
        xy_sum += float(jnp.sum(st.a_xy.astype(jnp.float64)))
    assert got["bond_sum"] == bond_sum               # integer counters: exact
    # coordinate checksum: trajectories are identical but the global f32
    # reduction order differs from the per-block sums (x64 is disabled)
    np.testing.assert_allclose(got["xy_checksum"], xy_sum, rtol=1e-5)
    assert got["step"] == steps + 1
