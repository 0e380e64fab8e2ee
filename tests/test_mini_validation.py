"""CI-grade statistical mini-validation (VERDICT r1 item 10): ~2k steps of
a dense reduced config against PRE-REGISTERED tolerance bands, so
statistical regressions in the integrated step (rates, gates, mobility,
RNG) are caught without the golden oracle.

Bands were registered from an 8-replica calibration run (2026-08-20,
commit-time numbers: mean bond_rl at step 2000 = 1.25, range 0..3;
receptor free-diffusion MSD/step analytic = 2*D*dt/9 = 2.222 A^2):
deterministic seeds make the run reproducible, the bands leave room for
platform-level f32 differences only."""

import jax
import jax.numpy as jnp
import numpy as np

from kmc_tpu.config import SimConfig
from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk

REPLICAS = 8
STEPS = 2000
CHUNK = 500


def _dense_cfg():
    return SimConfig(n_a=24, n_b=8, cell_range_x=700.0, cell_range_y=700.0,
                     cell_range_z=200.0, fused_align=False)


def test_mini_validation_bands():
    cfg = _dense_cfg()
    st0 = init_ensemble(cfg, REPLICAS, seed=0)
    x0 = np.asarray(st0.a_xy)
    chunk = make_ensemble_chunk(cfg, CHUNK, donate=False)

    st, obs = st0, None
    for _ in range(STEPS // CHUNK):
        st, obs = chunk(st)

    rl = np.asarray(obs.bond_rl)
    mono = np.asarray(obs.bond_mono_cis)
    cis = np.asarray(obs.bond_cis)
    bn = np.asarray(obs.bond_num)
    mx = np.asarray(obs.max_complex)

    # counter identity (reference invariant, main.cpp:1931-1938)
    np.testing.assert_array_equal(bn, rl + mono + cis)

    # pre-registered kinetics band: trans bonds form but slowly at this
    # density (calibration mean 1.25/replica at step 2000)
    assert 0.2 <= rl.mean() <= 3.5, rl
    assert mx.max() <= 10

    # free-receptor MSD per step vs the analytic reference moment 2*D*dt/9
    # (minimum-image displacement; drift << box/2 over this horizon)
    x1 = np.asarray(st.a_xy)
    d = x1 - x0
    for ax, box in enumerate((cfg.cell_range_x, cfg.cell_range_y)):
        d[..., ax] -= box * np.round(d[..., ax] / box)
    free = (np.asarray(st.a_trans) < 0) & (np.asarray(st.a_cis) < 0)
    msd = float(np.sum(d**2, axis=-1)[free].mean()) / STEPS
    analytic = 2 * cfg.rb_a_d * cfg.time_step / 9
    assert 0.75 * analytic <= msd <= 1.25 * analytic, (msd, analytic)

    # trajectories finite, steps advanced, in-box
    assert np.isfinite(x1).all()
    assert int(st.step[0]) == STEPS + 1
    assert (np.abs(x1[..., 0]) <= cfg.cell_range_x).all()
