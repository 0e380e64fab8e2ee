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
