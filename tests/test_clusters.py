"""Tests for label-propagation connected components (C8) against the
reference BFS semantics (main.cpp:505-562)."""

import numpy as np

from kmc_tpu.engine.clusters import cluster_labels
from kmc_tpu.engine.init import random_init


def test_all_singletons(small_cfg):
    st = random_init(small_cfg, 0)
    info = cluster_labels(st, small_cfg)
    np.testing.assert_array_equal(np.asarray(info.label), np.arange(small_cfg.n))
    assert np.all(np.asarray(info.size) == 1)


def test_chain_cluster(small_cfg):
    """A0 - B0(site1), A1 cis A0, A1 - B1(site2): one 4-member component."""
    na = small_cfg.n_a
    st = random_init(small_cfg, 0)
    st = st._replace(
        a_trans=st.a_trans.at[0].set(na + 0).at[1].set(na + 1),
        a_site=st.a_site.at[0].set(1).at[1].set(2),
        a_cis=st.a_cis.at[0].set(1).at[1].set(0),
        b_partner=st.b_partner.at[0, 0].set(0).at[1, 1].set(1),
    )
    info = cluster_labels(st, small_cfg)
    lab = np.asarray(info.label)
    assert lab[0] == lab[1] == lab[na] == lab[na + 1] == 0
    assert np.asarray(info.size)[0] == 4
    assert np.asarray(info.n_a)[0] == 2
    assert np.asarray(info.n_b)[na] == 2
    # everyone else untouched
    assert np.asarray(info.size)[2] == 1


def test_cis_pair_cluster(small_cfg):
    st = random_init(small_cfg, 0)
    st = st._replace(a_cis=st.a_cis.at[3].set(7).at[7].set(3))
    info = cluster_labels(st, small_cfg)
    lab = np.asarray(info.label)
    assert lab[3] == lab[7] == 3
    assert np.asarray(info.size)[7] == 2
    assert np.asarray(info.n_b)[3] == 0


def test_long_chain_converges(small_cfg):
    """Worst-case chain A0-cis... via alternating trans/cis links resolves
    exactly under label_closure_iters adjacency squarings (2^iters covers
    the chain diameter; see clusters.reachability)."""
    na = small_cfg.n_a
    st = random_init(small_cfg, 0)
    # chain: B0-A0, A0 cis A1, A1-B1, B1-A2? A2 can't bind B1 twice; build
    # B_k bound to A_(2k), A_(2k) cis A_(2k+1), A_(2k+1) bound to B_(k+1)
    a_trans, a_site, a_cis, b_partner = (
        st.a_trans, st.a_site, st.a_cis, st.b_partner,
    )
    n_links = min(small_cfg.n_b - 1, na // 2 - 1)
    for k in range(n_links):
        a1, a2 = 2 * k, 2 * k + 1
        a_trans = a_trans.at[a1].set(na + k)
        a_site = a_site.at[a1].set(1)
        b_partner = b_partner.at[k, 0].set(a1)
        a_cis = a_cis.at[a1].set(a2).at[a2].set(a1)
        a_trans = a_trans.at[a2].set(na + k + 1)
        a_site = a_site.at[a2].set(2)
        b_partner = b_partner.at[k + 1, 1].set(a2)
    st = st._replace(a_trans=a_trans, a_site=a_site, a_cis=a_cis,
                     b_partner=b_partner)
    info = cluster_labels(st, small_cfg)
    lab = np.asarray(info.label)
    assert lab[na + n_links] == 0          # last B reaches the root label
    assert np.asarray(info.size)[0] == 3 * n_links + 1
