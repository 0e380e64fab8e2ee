"""The fused Pallas idealize core must match the XLA idealize bitwise
(interpret mode on CPU)."""

import numpy as np

import jax

from kmc_tpu import rng
from kmc_tpu.engine.align import idealize, idealize_fused
from kmc_tpu.engine.clusters import cluster_labels

from helpers import ideal_cis_pair, ideal_trans_pair, spread_state


def _both(st, cfg, step=7):
    info = cluster_labels(st, cfg)
    skey = rng.stream_key(rng.step_key(st.key, step), rng.STREAM_ALIGN)
    a = idealize(st, info, skey, cfg)
    b = idealize_fused(st, info, skey, cfg, interpret=True)
    return a, b


def _assert_state_close(a, b):
    np.testing.assert_allclose(np.asarray(a.a_xy), np.asarray(b.a_xy),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.a_psi), np.asarray(b.a_psi),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.b_center), np.asarray(b.b_center),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.b_quat), np.asarray(b.b_quat),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.b_laid), np.asarray(b.b_laid))


def test_fused_matches_xla_loose_trans(small_cfg):
    import jax.numpy as jnp

    st = spread_state(small_cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=small_cfg, bond=True)
    st = st._replace(
        a_xy=st.a_xy.at[0].add(jnp.asarray([4.0, -3.0])),
        a_psi=st.a_psi.at[0].add(0.3),
    )
    a, b = _both(st, small_cfg)
    _assert_state_close(a, b)


def test_fused_matches_xla_unlaid(small_cfg):
    from kmc_tpu.geometry import quat_from_euler, quat_mul

    cfg = small_cfg
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    st = st._replace(
        b_quat=st.b_quat.at[0].set(
            quat_mul(quat_from_euler(0.4, 0.2, 0.1), st.b_quat[0])
        ),
        b_laid=st.b_laid.at[0].set(False),
        b_center=st.b_center.at[0, 2].add(17.0),
    )
    a, b = _both(st, cfg)
    _assert_state_close(a, b)


def test_fused_matches_xla_merged_complex(small_cfg):
    import jax.numpy as jnp
    import numpy as _np

    cfg = small_cfg
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    ux = _np.array([_np.cos(float(st.a_psi[0])), _np.sin(float(st.a_psi[0]))])
    a1_xy = _np.asarray(st.a_xy[0]) - ux * (2 * cfg.rb_a_radius + 9.0)
    na = cfg.n_a
    st = st._replace(
        a_xy=st.a_xy.at[1].set(jnp.asarray(a1_xy)),
        a_psi=st.a_psi.at[1].set(st.a_psi[0] + jnp.pi + 0.05),
        a_cis=st.a_cis.at[0].set(1).at[1].set(0),
        b_center=st.b_center.at[1].set(
            jnp.asarray([a1_xy[0] - 120.0, a1_xy[1], cfg.plane_z])
        ),
        b_laid=st.b_laid.at[1].set(True),
        a_trans=st.a_trans.at[1].set(na + 1),
        a_site=st.a_site.at[1].set(2),
        b_partner=st.b_partner.at[1, 1].set(1),
    )
    a, b = _both(st, cfg)
    _assert_state_close(a, b)


def test_fused_matches_xla_cis_pair(small_cfg):
    import jax.numpy as jnp

    st = ideal_cis_pair(spread_state(small_cfg, 0), 0, 1, small_cfg, bond=True)
    st = st._replace(a_xy=st.a_xy.at[1].add(jnp.asarray([3.0, 2.0])))
    a, b = _both(st, small_cfg)
    _assert_state_close(a, b)


def test_fused_vmapped(small_cfg):
    from kmc_tpu.parallel.ensemble import init_ensemble

    cfg = small_cfg
    ens = init_ensemble(cfg, 3, seed=0)

    def one(st):
        info = cluster_labels(st, cfg)
        skey = rng.stream_key(rng.step_key(st.key, st.step), rng.STREAM_ALIGN)
        return idealize_fused(st, info, skey, cfg, interpret=True)

    out = jax.vmap(one)(ens)
    assert out.a_xy.shape == ens.a_xy.shape


def test_batched_kernel_matches_xla_with_bonds(small_cfg):
    """The vmapped fused core dispatches to the replica-BATCHED kernel
    (ops/pallas_align_batched.py via custom_vmap); it must match the XLA
    idealize on replicas with real bond topologies — trans pairs, unlaid
    ligands, merged complexes, cis pairs — including a batch size that
    needs padding to the block size."""
    import jax.numpy as jnp

    cfg = small_cfg
    variants = []
    # perturbed trans pair
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg, bond=True)
    variants.append(st._replace(
        a_xy=st.a_xy.at[0].add(jnp.asarray([4.0, -3.0])),
        a_psi=st.a_psi.at[0].add(0.3),
    ))
    # unlaid ligand
    from kmc_tpu.geometry import quat_from_euler, quat_mul
    st2 = ideal_trans_pair(spread_state(cfg, 1), a=2, b=1, site=2, cfg=cfg,
                           bond=True)
    variants.append(st2._replace(
        b_quat=st2.b_quat.at[1].set(
            quat_mul(quat_from_euler(0.4, 0.2, 0.1), st2.b_quat[1])
        ),
        b_laid=st2.b_laid.at[1].set(False),
        b_center=st2.b_center.at[1, 2].add(17.0),
    ))
    # perturbed cis pair
    st3 = ideal_cis_pair(spread_state(cfg, 2), 0, 1, cfg, bond=True)
    variants.append(st3._replace(a_xy=st3.a_xy.at[1].add(jnp.asarray([3.0, 2.0]))))
    # no bonds at all
    variants.append(spread_state(cfg, 3))
    # batch of 5 (not a multiple of the kernel block): pad path
    variants.append(spread_state(cfg, 4))

    ens = jax.tree.map(lambda *xs: jnp.stack(xs), *variants)

    def one(fused):
        def f(st):
            info = cluster_labels(st, cfg)
            skey = rng.stream_key(rng.step_key(st.key, 7), rng.STREAM_ALIGN)
            if fused:
                return idealize_fused(st, info, skey, cfg, interpret=True)
            return idealize(st, info, skey, cfg)
        return jax.vmap(f)(ens)

    a, b = one(False), one(True)
    _assert_state_close(a, b)
