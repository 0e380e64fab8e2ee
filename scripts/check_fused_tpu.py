#!/usr/bin/env python
"""Correctness + timing sanity for the fused align path on real TPU.

1. Run N steps of the reference-scale ensemble with fused_align=True on TPU;
   pull final state; report bond counts / displacement stats.
2. Run the same config+seed on CPU (XLA idealize path) and compare
   distributions (not bitwise: TPU f32 and matching RNG should give
   identical trajectories though -- report max deviation).
3. Time CHUNK=20 vs CHUNK=200 to confirm linear scaling (a no-op
   miscompile would be flat).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPLICAS = 256


def main():
    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk

    print(f"# backend: {jax.default_backend()}", flush=True)
    cfg = SimConfig(fused_align=True)

    state = init_ensemble(cfg, REPLICAS, seed=0)
    x0 = np.asarray(state.a_xy)
    chunk20 = make_ensemble_chunk(cfg, 20, donate=False)

    t0 = time.perf_counter()
    st20, obs = chunk20(state)
    st20 = jax.block_until_ready(st20)
    print(f"# compile+run 20: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    st20b, _ = chunk20(state)
    st20b = jax.block_until_ready(st20b)
    t20 = time.perf_counter() - t0

    chunk200 = make_ensemble_chunk(cfg, 200, donate=False)
    t0 = time.perf_counter()
    st200, _ = chunk200(state)
    st200 = jax.block_until_ready(st200)
    print(f"# compile+run 200: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    st200b, _ = chunk200(state)
    st200b = jax.block_until_ready(st200b)
    t200 = time.perf_counter() - t0

    print(f"t(20 steps)={t20*1e3:.2f}ms  t(200 steps)={t200*1e3:.2f}ms  "
          f"ratio={t200/max(t20,1e-9):.1f} (expect ~10 if real)", flush=True)

    x20 = np.asarray(st20.a_xy)
    disp = np.abs(x20 - x0).mean()
    nb_bonds = int(np.sum(np.asarray(st20.a_trans) >= 0))
    ncis = int(np.sum(np.asarray(st20.a_cis) >= 0))
    nan_ok = not (np.isnan(x20).any()
                  or np.isnan(np.asarray(st20.b_center)).any())
    print(f"after 20 steps: mean|dxy|={disp:.3f} A  trans_bonds={nb_bonds} "
          f"cis={ncis}  finite={nan_ok}  step={int(st20.step[0])}", flush=True)

    x200 = np.asarray(st200.a_xy)
    print(f"after 200 steps: mean|dxy|={np.abs(x200 - x0).mean():.3f} A  "
          f"trans_bonds={int(np.sum(np.asarray(st200.a_trans) >= 0))}",
          flush=True)

    np.save("/tmp/fused_tpu_axy20.npy", x20)
    np.save("/tmp/fused_tpu_atrans20.npy", np.asarray(st20.a_trans))


if __name__ == "__main__":
    main()
