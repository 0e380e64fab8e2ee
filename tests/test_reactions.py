"""Tests for the reaction engine (C16-C18) using hand-built geometries."""

import numpy as np

import jax
import jax.numpy as jnp

from kmc_tpu import rng
from kmc_tpu.engine.reactions import react
from kmc_tpu.utils.checks import assert_invariants

from helpers import ideal_cis_pair, ideal_trans_pair, spread_state


def _react(st, cfg, step=123):
    skey = rng.step_key(st.key, step)
    return jax.jit(react, static_argnums=2)(st, skey, cfg)


def test_trans_association_fires(small_cfg):
    cfg = small_cfg.replace(ass_rate=1.0)        # p = 1 per eligible pair
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg)
    out = _react(st, cfg)
    na = cfg.n_a
    assert int(out.a_trans[0]) == na
    assert int(out.a_site[0]) == 1
    assert int(out.b_partner[0, 0]) == 0
    assert_invariants(out, cfg, "after trans assoc")


def test_trans_association_respects_gates(small_cfg):
    cfg = small_cfg.replace(ass_rate=1.0)
    st = spread_state(cfg, 0)
    # receptor rotated 180 deg: its trans site faces AWAY -> theta_ot fails
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg)
    st = st._replace(a_psi=st.a_psi.at[0].add(jnp.pi))
    out = _react(st, cfg)
    assert int(out.a_trans[0]) == -1


def test_trans_association_zero_rate(small_cfg):
    cfg = small_cfg.replace(ass_rate=0.0)
    st = ideal_trans_pair(spread_state(cfg, 0), a=0, b=0, site=1, cfg=cfg)
    out = _react(st, cfg)
    assert int(out.a_trans[0]) == -1


def test_trans_conflict_single_winner(small_cfg):
    """Two receptors in ideal geometry behind the same site: exactly one wins."""
    cfg = small_cfg.replace(ass_rate=1.0)
    st = spread_state(cfg, 0)
    st = ideal_trans_pair(st, a=0, b=0, site=1, cfg=cfg)
    # stack receptor 1 at the same ideal pose as receptor 0 (overlapping is
    # fine for the reaction stage; collision is diffusion's job)
    st = st._replace(
        a_xy=st.a_xy.at[1].set(st.a_xy[0]), a_psi=st.a_psi.at[1].set(st.a_psi[0])
    )
    out = _react(st, cfg)
    winners = [i for i in range(2) if int(out.a_trans[i]) >= 0]
    assert len(winners) == 1
    assert int(out.b_partner[0, 0]) == winners[0]
    from kmc_tpu.utils.checks import topology_mutual

    assert bool(topology_mutual(out, cfg))   # geometry overlap is deliberate


def test_mono_cis_association(small_cfg):
    cfg = small_cfg.replace(mono_cis_ass_rate=1.0)
    st = ideal_cis_pair(spread_state(cfg, 0), 0, 1, cfg)
    out = _react(st, cfg)
    assert int(out.a_cis[0]) == 1 and int(out.a_cis[1]) == 0
    assert_invariants(out, cfg, "after mono cis")


def test_complex_cis_channel_selection(small_cfg):
    """Trans-bound receptor pairs react through the complex-cis channel only."""
    cfg = small_cfg.replace(mono_cis_ass_rate=1.0, cis_ass_rate=0.0)
    st = ideal_cis_pair(spread_state(cfg, 0), 0, 1, cfg)
    # bind receptor 0 to a ligand -> pair is no longer mono-eligible
    na = cfg.n_a
    st = st._replace(
        a_trans=st.a_trans.at[0].set(na + 3),
        a_site=st.a_site.at[0].set(2),
        b_partner=st.b_partner.at[3, 1].set(0),
    )
    out = _react(st, cfg)
    assert int(out.a_cis[0]) == -1            # complex rate is 0

    cfg2 = small_cfg.replace(mono_cis_ass_rate=0.0, cis_ass_rate=1.0)
    out2 = _react(st, cfg2)
    assert int(out2.a_cis[0]) == 1            # complex channel fires


def test_trans_dissociation(small_cfg):
    cfg = small_cfg.replace(ass_rate=0.0, diss_rate=1.0)
    st = ideal_trans_pair(spread_state(cfg, 0), a=0, b=0, site=1, cfg=cfg,
                          bond=True)
    out = _react(st, cfg)
    assert int(out.a_trans[0]) == -1
    assert int(out.b_partner[0, 0]) == -1
    assert_invariants(out, cfg, "after trans dissoc")


def test_cis_dissociation_channels(small_cfg):
    # mono bond with mono rate 1 -> breaks
    cfg = small_cfg.replace(mono_cis_ass_rate=0.0, cis_ass_rate=0.0,
                            mono_cis_diss_rate=1.0, cis_diss_rate=0.0)
    st = ideal_cis_pair(spread_state(cfg, 0), 0, 1, cfg, bond=True)
    out = _react(st, cfg)
    assert int(out.a_cis[0]) == -1

    # same state but complex rate 1 and mono rate 0 -> survives (both free)
    cfg2 = small_cfg.replace(mono_cis_ass_rate=0.0, cis_ass_rate=0.0,
                             mono_cis_diss_rate=0.0, cis_diss_rate=1.0)
    out2 = _react(st, cfg2)
    assert int(out2.a_cis[0]) == 1


def test_double_scan_probability(small_cfg):
    """Unordered cis pairs are tested twice per step (main.cpp:1952-1953):
    empirical accept rate must match 1-(1-p)^2, not p."""
    p = 0.2
    cfg = small_cfg.replace(mono_cis_ass_rate=p / cfg_dt(small_cfg),
                            cis_ass_rate=0.0)
    st0 = ideal_cis_pair(spread_state(cfg, 0), 0, 1, cfg)
    hits = 0
    trials = 400
    for s in range(trials):
        out = _react(st0, cfg, step=s)
        hits += int(out.a_cis[0] == 1)
    want = 1 - (1 - p) ** 2                    # 0.36
    got = hits / trials
    assert abs(got - want) < 0.06, (got, want)


def cfg_dt(cfg):
    return cfg.time_step


def test_tiny_bernoulli_resolution():
    """rng.tiny_bernoulli must (a) match moderate probabilities, (b) fire
    essentially never at the reference's Diss_Rate*dt = 3.48e-12 — where a
    raw f32 `uniform < p` fires at its ~2^-23 quantization atom (~1e-7),
    the root cause of the round-2 bond_cis kinetics bias."""
    key = jax.random.key(7)
    n = 1_000_000
    # moderate p: statistical match
    p = 1e-3
    hits = int(jnp.sum(rng.tiny_bernoulli(key, p, (n,))))
    assert abs(hits - n * p) < 5 * np.sqrt(n * p)          # ~5 sigma
    # tiny p: zero fires in 30M draws (expected 1e-4; the f32 comparison
    # would fire ~3.6 times at its quantization floor)
    total = 0
    for i in range(30):
        k = jax.random.fold_in(key, i)
        total += int(jnp.sum(rng.tiny_bernoulli(k, 3.48e-12, (n,))))
    assert total == 0
    # demonstrate the f32 failure mode this replaces (documents the bug):
    f32_fires = 0
    for i in range(30):
        k = jax.random.fold_in(key, 100 + i)
        u = jax.random.uniform(k, (n,))
        f32_fires += int(jnp.sum(u < 3.48e-12))
    assert f32_fires > 0                                   # the broken form
    # p = 0 never fires
    assert int(jnp.sum(rng.tiny_bernoulli(key, 0.0, (n,)))) == 0


def _pair_hist_symmetric(match_fn, score_fn, n_trials, na, p, rounds, seed):
    """Committed-pair histogram + per-trial committed counts for the
    symmetric matcher under heavy contention (all pairs eligible)."""
    import jax

    elig = ~jnp.eye(na, dtype=bool)

    def trial(key):
        ku, ks = jax.random.split(key)
        u = jax.random.uniform(ku, (na, na))
        fire = (u < p) | (u.T < p)
        cand = elig & fire
        score = score_fn(u, ks)
        from kmc_tpu.engine.reactions import _mutual_match_symmetric

        m = _mutual_match_symmetric(cand, score, rounds)
        return m, jnp.sum(m) // 2

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(seed), i))(
        jnp.arange(n_trials))
    ms, counts = jax.jit(jax.vmap(trial))(keys)
    return np.asarray(jnp.sum(ms, axis=0)), np.asarray(counts)


def test_matching_tiebreak_independence():
    """VERDICT r3 #5: the matching priority `(u*7919)%1` reuses the fire
    uniforms; under contention the committed-pair distribution must be
    indistinguishable from matching on an INDEPENDENT uniform priority.
    Chi-square two-sample test on committed-pair frequencies plus a mean
    committed-count comparison, at a fire probability high enough that
    nearly every trial has contention (na=6, p=0.3)."""
    na, p, rounds, trials = 6, 0.3, 2, 20000

    def score_mixed(u, ks):
        s = (u * 7919.0) % 1.0
        return jnp.minimum(s, s.T)

    def score_indep(u, ks):
        s = jax.random.uniform(ks, (na, na))
        return jnp.minimum(s, s.T)

    h_mix, c_mix = _pair_hist_symmetric(None, score_mixed, trials, na, p,
                                        rounds, seed=11)
    h_ind, c_ind = _pair_hist_symmetric(None, score_indep, trials, na, p,
                                        rounds, seed=12)

    # all-pairs symmetric geometry: every unordered pair is exchangeable, so
    # compare the two implementations' pair-frequency tables directly
    iu = np.triu_indices(na, 1)
    o1, o2 = h_mix[iu].astype(float), h_ind[iu].astype(float)
    # two-sample chi-square over the 15 pair bins
    tot1, tot2 = o1.sum(), o2.sum()
    exp1 = (o1 + o2) * tot1 / (tot1 + tot2)
    exp2 = (o1 + o2) * tot2 / (tot1 + tot2)
    chi2 = float(np.sum((o1 - exp1) ** 2 / exp1 + (o2 - exp2) ** 2 / exp2))
    dof = len(o1) - 1
    # p-value via Wilson-Hilferty approximation (no scipy dependency)
    z = ((chi2 / dof) ** (1 / 3) - (1 - 2 / (9 * dof))) / np.sqrt(2 / (9 * dof))
    assert z < 3.5, (chi2, dof, z)         # not improbably different

    # each pair bin should also be individually uniform across the 15 bins
    for h in (o1, o2):
        exp = h.sum() / len(h)
        chi2u = float(np.sum((h - exp) ** 2 / exp))
        zu = (((chi2u / dof) ** (1 / 3) - (1 - 2 / (9 * dof)))
              / np.sqrt(2 / (9 * dof)))
        assert zu < 3.5, (chi2u, zu)

    # committed-count distributions must agree (mean within joint 5 sigma)
    se = np.sqrt(c_mix.var() / trials + c_ind.var() / trials)
    assert abs(c_mix.mean() - c_ind.mean()) < 5 * se, (
        c_mix.mean(), c_ind.mean(), se)


def test_matching_tiebreak_independence_bipartite():
    """Same independence check for the bipartite (trans) matcher: committed
    column histogram per row under contention, mixed vs independent score."""
    import jax

    from kmc_tpu.engine.reactions import _mutual_match_bipartite

    ni, ns, p, rounds, trials = 5, 6, 0.3, 2, 20000

    def run(score_from_u, seed):
        def trial(key):
            ku, ks = jax.random.split(key)
            u = jax.random.uniform(ku, (ni, ns))
            cand = u < p
            score = ((u * 7919.0) % 1.0 if score_from_u
                     else jax.random.uniform(ks, (ni, ns)))
            m = _mutual_match_bipartite(cand, score, rounds)
            return m, jnp.sum(m)

        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.key(seed), i)
        )(jnp.arange(trials))
        ms, counts = jax.jit(jax.vmap(trial))(keys)
        return np.asarray(jnp.sum(ms, axis=0)), np.asarray(counts)

    h_mix, c_mix = run(True, 21)
    h_ind, c_ind = run(False, 22)
    o1, o2 = h_mix.ravel().astype(float), h_ind.ravel().astype(float)
    tot1, tot2 = o1.sum(), o2.sum()
    exp1 = (o1 + o2) * tot1 / (tot1 + tot2)
    exp2 = (o1 + o2) * tot2 / (tot1 + tot2)
    chi2 = float(np.sum((o1 - exp1) ** 2 / exp1 + (o2 - exp2) ** 2 / exp2))
    dof = len(o1) - 1
    z = ((chi2 / dof) ** (1 / 3) - (1 - 2 / (9 * dof))) / np.sqrt(2 / (9 * dof))
    assert z < 3.5, (chi2, dof, z)
    se = np.sqrt(c_mix.var() / trials + c_ind.var() / trials)
    assert abs(c_mix.mean() - c_ind.mean()) < 5 * se
