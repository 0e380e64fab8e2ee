"""Runtime-parameter sweeps: one compiled step, heterogeneous physics per
replica (the EP analogue of SURVEY.md §2)."""

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu.engine.params import from_config, sweep
from kmc_tpu.engine.step import step_fn
from kmc_tpu.parallel.ensemble import init_ensemble

from helpers import ideal_cis_pair, spread_state


def test_sweep_shapes(small_cfg):
    rp = sweep(small_cfg, 4, p_trans_ass=jnp.asarray([0.0, 0.1, 0.5, 1.0]))
    assert rp.p_trans_ass.shape == (4,)
    assert rp.rb_a_d.shape == (4,)
    np.testing.assert_allclose(np.asarray(rp.rb_a_d), small_cfg.rb_a_d)


def test_default_params_match_config(small_cfg):
    """step with explicit default params == step without params."""
    st = spread_state(small_cfg, 0)
    s1, o1 = jax.jit(lambda s: step_fn(s, small_cfg))(st)
    s2, o2 = jax.jit(lambda s: step_fn(s, small_cfg, from_config(small_cfg)))(st)
    np.testing.assert_array_equal(np.asarray(s1.a_xy), np.asarray(s2.a_xy))
    np.testing.assert_array_equal(np.asarray(s1.a_trans), np.asarray(s2.a_trans))


def test_rate_sweep_changes_kinetics(small_cfg):
    """Replicas with mono-cis rate 0 never bond; rate 1/dt replicas do —
    all in one vmapped call."""
    cfg = small_cfg
    n_rep = 4
    base = init_ensemble(cfg, n_rep, seed=0)
    # place an ideal cis pair in every replica (broadcast every field except
    # the per-replica RNG keys, which don't support broadcast_to)
    one = ideal_cis_pair(jax.tree.map(lambda x: x[0], base), 0, 1, cfg)
    st = base._replace(**{
        f: jnp.broadcast_to(getattr(one, f), getattr(base, f).shape).astype(
            getattr(base, f).dtype
        )
        for f in base._fields if f != "key"
    })
    # nudge A1 toward A0 so the site gap is strictly inside the 15 A gate,
    # and freeze diffusion so the step's move phase keeps the geometry
    ux = jnp.stack([jnp.cos(st.a_psi[:, 0]), jnp.sin(st.a_psi[:, 0])], -1)
    st = st._replace(a_xy=st.a_xy.at[:, 1].add(2.0 * ux))
    rp = sweep(
        cfg, n_rep,
        p_mono_cis_ass=jnp.asarray([0.0, 0.0, 1.0, 1.0]),
        rb_a_d=jnp.zeros(n_rep), rb_a_rot_d=jnp.zeros(n_rep),
        rb_b_d=jnp.zeros(n_rep), rb_b_rot_d=jnp.zeros(n_rep),
    )
    vstep = jax.jit(jax.vmap(lambda s, r: step_fn(s, cfg, r)))
    st2, obs = vstep(st, rp)
    cis = np.asarray(st2.a_cis[:, 0])
    assert cis[0] == -1 and cis[1] == -1
    assert cis[2] == 1 and cis[3] == 1


def test_frozen_diffusion_sweep(small_cfg):
    """rb_a_d = 0 replicas keep receptors still; others move."""
    cfg = small_cfg
    base = init_ensemble(cfg, 2, seed=1)
    rp = sweep(cfg, 2, rb_a_d=jnp.asarray([0.0, cfg.rb_a_d]),
               rb_a_rot_d=jnp.asarray([0.0, cfg.rb_a_rot_d]))
    vstep = jax.jit(jax.vmap(lambda s, r: step_fn(s, cfg, r)))
    st2, _ = vstep(base, rp)
    d0 = np.abs(np.asarray(st2.a_xy[0]) - np.asarray(base.a_xy[0])).max()
    d1 = np.abs(np.asarray(st2.a_xy[1]) - np.asarray(base.a_xy[1])).max()
    assert d0 == 0.0
    assert d1 > 0.0
