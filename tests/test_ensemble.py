"""Tests for replica-ensemble parallelism (vmap + ('dp',) mesh sharding on
the 8-device virtual CPU platform — SURVEY.md §4 multi-host-without-a-cluster)."""

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from kmc_tpu.parallel.ensemble import (
    init_ensemble,
    make_ensemble_chunk,
    make_ensemble_step,
    merge_observables,
)
from kmc_tpu.parallel.mesh import replica_mesh, shard_replicated_state


def test_replicas_are_independent(small_cfg):
    st = init_ensemble(small_cfg, 4, seed=0)
    xy = np.asarray(st.a_xy)
    assert not np.allclose(xy[0], xy[1])
    step = make_ensemble_step(small_cfg, donate=False)
    st2, obs = step(st)
    assert st2.a_xy.shape == (4, small_cfg.n_a, 2)
    d = np.asarray(st2.a_xy) - xy
    assert not np.allclose(d[0], d[1])          # different streams


def test_vmapped_matches_single(small_cfg):
    from kmc_tpu.engine.init import random_init_from_key
    from kmc_tpu.engine.step import make_step_fn
    from kmc_tpu import rng as _rng

    st = init_ensemble(small_cfg, 3, seed=0)
    step = make_ensemble_step(small_cfg, donate=False)
    st2, _ = step(st)

    single = make_step_fn(small_cfg)
    one = random_init_from_key(
        small_cfg, _rng.replica_key(_rng.base_key(0), 1)
    )
    one2, _ = single(one)
    np.testing.assert_allclose(
        np.asarray(st2.a_xy[1]), np.asarray(one2.a_xy), atol=1e-5
    )


def test_sharded_ensemble_runs(small_cfg):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    mesh = replica_mesh()
    st = init_ensemble(small_cfg, 2 * n_dev, seed=0)
    st = shard_replicated_state(st, mesh)
    assert st.a_xy.sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp")), st.a_xy.ndim
    )
    step = make_ensemble_step(small_cfg, donate=False)
    st2, obs = step(st)
    jax.block_until_ready(st2)
    # outputs stay sharded over dp (no implicit gather)
    assert st2.a_xy.sharding.is_equivalent_to(
        NamedSharding(mesh, P("dp")), st2.a_xy.ndim
    )
    merged = merge_observables(obs)
    assert merged.bond_num.shape == ()


def test_sharded_matches_unsharded(small_cfg):
    mesh = replica_mesh()
    st = init_ensemble(small_cfg, 8, seed=3)
    chunk = make_ensemble_chunk(small_cfg, 5, donate=False)
    plain, _ = chunk(st)
    sharded_in = shard_replicated_state(st, mesh)
    sharded, _ = chunk(sharded_in)
    np.testing.assert_allclose(
        np.asarray(plain.a_xy), np.asarray(sharded.a_xy), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(plain.a_trans), np.asarray(sharded.a_trans)
    )
