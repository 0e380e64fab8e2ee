"""Stochastic reaction engine (components C16-C18 of SURVEY.md §2).

The reference fires six channels with sequential O(N^2) pair scans
(main.cpp:1874-2141); within a step, later channels see earlier channels'
topology writes.  The TPU design evaluates each channel as a dense gated
tensor — eligibility masks x geometric gates x Bernoulli draws — and
resolves write conflicts (one receptor matching several sites, or vice
versa) by mutual-argmax matching on random priorities, a distribution-
preserving replacement for the reference's scan-order tie-breaking.
Channels apply sequentially in reference order, so cross-channel visibility
is preserved (e.g. a trans bond formed this step excludes its receptor from
mono-cis and enables complex-cis, main.cpp:1955-1958 vs :2012).

Channel summary (rates in ns^-1, main.cpp:80-99):
  trans assoc  A+B  site dist < 18 A, |theta_pd| < 45, |theta_ot-180| < 90,
               p = 0.04*dt                      (:1877-1949)
  mono-cis     A+A  both trans-free, dist < 15, |theta_ot-180| < 10,
               p = 4.7e-5*dt, each unordered pair tested twice (:1952-2003)
  complex-cis  A+A  >=1 trans-bound, same gates, p = 9.6e-4*dt (:2007-2058)
  trans dissoc       p = 3.48e-13*dt            (:2063-2092)
  mono-cis dissoc    p = 1.12e-13*dt, tested once per bond member (:2097-2117)
  complex-cis dissoc p = 1.12e-13*dt            (:2120-2141)

The mono/complex cis distinction is purely a function of current trans
status (both free vs >=1 bound) — the reference's counter reclassification
corner cases (:1934-1939, :2083-2088) maintain exactly this invariant, so
no per-bond labels are stored (see observables.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kmc_tpu import rng
from kmc_tpu.config import SimConfig
from kmc_tpu.engine.params import RuntimeParams, from_config
from kmc_tpu.geometry import angle_gate_above_deg, angle_gate_below_deg
from kmc_tpu.ops import dense
from kmc_tpu.state import SimState, positions


def _mutual_match_bipartite(cand, score, rounds):
    """Resolve a bipartite candidate matrix cand[i, s] (s = flattened site)
    to a matching where each row and column commits at most once.
    Returns bool[i, s] of committed pairs."""
    ni, ns = cand.shape
    committed = jnp.zeros_like(cand)

    def body(_, carry):
        committed, avail_r, avail_c = carry
        c = cand & avail_r[:, None] & avail_c[None, :]
        s = jnp.where(c, score, -jnp.inf)
        best_c = s == jnp.max(s, axis=1, keepdims=True)      # row's favorite
        best_r = s == jnp.max(s, axis=0, keepdims=True)      # col's favorite
        m = c & best_c & best_r
        committed = committed | m
        avail_r = avail_r & ~jnp.any(m, axis=1)
        avail_c = avail_c & ~jnp.any(m, axis=0)
        return committed, avail_r, avail_c

    carry = (committed, jnp.ones((ni,), bool), jnp.ones((ns,), bool))
    for _ in range(rounds):                     # unrolled: tiny bodies fuse
        carry = body(None, carry)
    return carry[0]


def _mutual_match_symmetric(cand, score, rounds):
    """Resolve a symmetric candidate matrix cand[i, j] (i != j) to a set of
    disjoint pairs.  score must be symmetric.  Returns bool[i, j]."""
    ni = cand.shape[0]
    committed = jnp.zeros_like(cand)

    def body(_, carry):
        committed, avail = carry
        c = cand & avail[:, None] & avail[None, :]
        s = jnp.where(c, score, -jnp.inf)
        best = s == jnp.max(s, axis=1, keepdims=True)
        m = c & best & best.T
        committed = committed | m
        avail = avail & ~jnp.any(m, axis=1)
        return committed, avail

    carry = (committed, jnp.ones((ni,), bool))
    for _ in range(rounds):                     # unrolled: tiny bodies fuse
        carry = body(None, carry)
    return carry[0]


def _cis_geometry(p, cfg: SimConfig):
    """Distance + orientation gates shared by both cis channels
    (main.cpp:1960-1981)."""
    na = cfg.n_a
    cis_site = p[:na, 2, 2, :]
    center2 = p[:na, 2, 0, :]
    diff = cis_site[None, :, :] - cis_site[:, None, :]
    dist2 = jnp.sum(diff * diff, axis=-1)
    v = center2 - cis_site                                  # [na, 3]
    # |theta - 180| < cutoff  <=>  theta > 180 - cutoff (cosine-domain gate)
    ang = angle_gate_above_deg(v[:, None, :], v[None, :, :],
                               180.0 - cfg.cis_thetaot_cutoff)
    geom = (dist2 < cfg.cis_dist_cutoff**2) & ang
    ii = jnp.arange(na)
    return geom & (ii[:, None] != ii[None, :])


def _cis_channel(a_cis, geom, elig_extra, prob, key, cfg: SimConfig):
    """One cis association channel; elig_extra[i, j] encodes the mono/complex
    trans-status condition.  Each unordered pair is tested twice (the
    reference scans ordered pairs, main.cpp:1952-1953)."""
    na = cfg.n_a
    free_cis = a_cis < 0
    elig = geom & free_cis[:, None] & free_cis[None, :] & elig_extra
    u = jax.random.uniform(key, (na, na))
    fire = (u < prob) | (u.T < prob)                        # two draws per pair
    cand = elig & elig.T & fire
    # tie-break priority decorrelated from the fire bits by bit-mixing the
    # same uniforms (priority only orders already-accepted candidates)
    score = (u * 7919.0) % 1.0
    score = jnp.minimum(score, score.T)                     # symmetric priority
    m = _mutual_match_symmetric(cand, score, cfg.match_rounds)
    partner = jnp.where(jnp.any(m, axis=1), jnp.argmax(m, axis=1), -1)
    a_cis = jnp.where(partner >= 0, partner, a_cis)
    # diag: eligible ordered pairs / committed bonds (unused counts are DCE'd)
    return a_cis, jnp.sum(elig), jnp.sum(m) // 2


def react(state: SimState, skey, cfg: SimConfig,
          rp: RuntimeParams = None, diag: bool = False):
    """Apply the six reaction channels.  With ``diag=True`` returns
    (state, dict) where the dict holds per-channel eligible-candidate and
    accepted-event counts for flux comparison against an instrumented
    reference build (scripts/chan_flux.py); counting conventions mirror the
    reference scan: trans eligibility counts (i, b, site) triples
    (main.cpp:1877-1918), cis eligibility counts ordered pairs
    (:1952-1984, :2007-2038), acceptance counts bonds once."""
    rp = rp if rp is not None else from_config(cfg)
    dg = {}
    na, nb = cfg.n_a, cfg.n_b
    p = positions(state, cfg)

    a_trans, a_site, a_cis = state.a_trans, state.a_site, state.a_cis
    b_partner = state.b_partner

    # ================= trans association (C16) =================
    k = rng.stream_key(skey, rng.STREAM_REACT_TRANS)
    k1, k2 = jax.random.split(k)

    a_tsite = p[:na, 2, 1, :]                 # A trans site  [i][3][2]
    a_c2 = p[:na, 2, 0, :]                    # A bead-2 center
    a_orient = p[:na, 2, 3, :]                # A +z marker   [i][3][4]
    b_sites = p[na:, 1:, 1, :]                # [nb, 3, 3]
    b_beads = p[na:, 1:, 0, :]
    b_ctr = p[na:, 0, 0, :]
    b_up = p[na:, 0, 1, :]

    diff = b_sites[None, :, :, :] - a_tsite[:, None, None, :]
    dist2 = jnp.sum(diff * diff, axis=-1)                   # [na, nb, 3]
    v_a = a_c2 - a_tsite                                    # [na, 3]
    v_b = b_beads - b_sites                                 # [nb, 3, 3]
    # |theta_ot - 180| < cutoff  <=>  theta_ot > 180 - cutoff; |theta_pd| <
    # cutoff as-is (main.cpp:1915 conventions, in cosine domain)
    g_ot = angle_gate_above_deg(v_a[:, None, None, :], v_b[None, :, :, :],
                                180.0 - cfg.bond_thetaot_cutoff)
    w_a = a_c2 - a_orient                                   # [na, 3] = (0,0,-R)
    w_b = b_ctr - b_up                                      # [nb, 3]
    g_pd = angle_gate_below_deg(w_a[:, None, :], w_b[None, :, :],
                                cfg.bond_thetapd_cutoff)    # [na, nb]

    gate = (
        (dist2 < cfg.bond_dist_cutoff**2)
        & g_ot
        & g_pd[:, :, None]
    )
    elig = gate & (a_trans < 0)[:, None, None] & (b_partner < 0)[None, :, :]
    fire = jax.random.uniform(k1, (na, nb, 3)) < rp.p_trans_ass
    cand = (elig & fire).reshape(na, nb * 3)
    score = jax.random.uniform(k2, (na, nb * 3))
    m = _mutual_match_bipartite(cand, score, cfg.match_rounds)   # [na, nb*3]

    hit_a = jnp.any(m, axis=1)
    flat = jnp.argmax(m, axis=1)
    new_b = flat // 3
    new_s = flat % 3
    a_trans = jnp.where(hit_a, na + new_b, a_trans)
    a_site = jnp.where(hit_a, new_s + 1, a_site)
    m3 = m.reshape(na, nb, 3)
    hit_site = jnp.any(m3, axis=0)                               # [nb, 3]
    which_a = jnp.argmax(m3, axis=0)
    b_partner = jnp.where(hit_site, which_a, b_partner)

    # ================= cis associations (C17) =================
    geom = _cis_geometry(p, cfg)
    trans_free = a_trans < 0

    k = rng.stream_key(skey, rng.STREAM_REACT_MONO_CIS)
    a_cis, elig_mono, acc_mono = _cis_channel(
        a_cis,
        geom,
        trans_free[:, None] & trans_free[None, :],
        rp.p_mono_cis_ass,
        k,
        cfg,
    )

    k = rng.stream_key(skey, rng.STREAM_REACT_CIS)
    a_cis, elig_cis, acc_cis = _cis_channel(
        a_cis,
        geom,
        ~(trans_free[:, None] & trans_free[None, :]),
        rp.p_cis_ass,
        k,
        cfg,
    )

    # ================= trans dissociation (C18) =================
    # dissociation probabilities are ~1e-12 (rate * dt, main.cpp:91, :81,
    # :86): they MUST use the 64-bit-resolution Bernoulli — an f32
    # `uniform < p` fires at its ~2^-23 quantization (~1e-7) regardless of
    # p, which round-2 validation exposed as the bond_cis kinetics bias
    k = rng.stream_key(skey, rng.STREAM_DISS_TRANS)
    unbind = (a_trans >= 0) & rng.tiny_bernoulli(k, rp.p_trans_diss, (na,))
    # clear B side over (b, site): dense scatter (ops/dense.py — a traced-
    # index .at[].max hits the same scalar-core path as gathers)
    bidx = jnp.clip(a_trans - na, 0, nb - 1)
    sidx = jnp.clip(a_site - 1, 0, 2)
    clear = dense.scatter_or_2d(bidx, sidx, unbind, nb, 3)
    b_partner = jnp.where(clear, -1, b_partner)
    a_trans = jnp.where(unbind, -1, a_trans)
    a_site = jnp.where(unbind, -1, a_site)

    # ================= cis dissociations =================
    trans_free = a_trans < 0
    has_cis = a_cis >= 0
    partner = jnp.clip(a_cis, 0, na - 1)
    ohp = dense.onehot(partner, na)            # shared partner-gather one-hot
    both_free = trans_free & dense.take(trans_free, ohp)

    def cis_unbind(key, prob, member_mask):
        fire = has_cis & member_mask & rng.tiny_bernoulli(key, prob, (na,))
        brk = fire | dense.take(fire, ohp)                  # either member fires
        return brk

    k = rng.stream_key(skey, rng.STREAM_DISS_MONO_CIS)
    brk = cis_unbind(k, rp.p_mono_cis_diss, both_free)
    k = rng.stream_key(skey, rng.STREAM_DISS_CIS)
    brk = brk | cis_unbind(k, rp.p_cis_diss, has_cis & ~both_free)
    a_cis = jnp.where(brk, -1, a_cis)

    # any topology change means geometry needs (re-)idealization next step
    changed = (
        jnp.any(a_trans != state.a_trans)
        | jnp.any(a_cis != state.a_cis)
        | jnp.any(b_partner != state.b_partner)
    )
    out = state._replace(
        a_trans=a_trans, a_site=a_site, a_cis=a_cis, b_partner=b_partner,
        dirty=state.dirty | changed,
    )
    if diag:
        dg = {
            "elig_trans": jnp.sum(elig), "acc_trans": jnp.sum(hit_a),
            "elig_mono": elig_mono, "acc_mono": acc_mono,
            "elig_cis": elig_cis, "acc_cis": acc_cis,
            "dis_trans": jnp.sum(unbind),
        }
        return out, dg
    return out
