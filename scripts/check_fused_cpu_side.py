#!/usr/bin/env python
"""CPU-side comparison for scripts/check_fused_tpu.py: run the same
config + seed with the XLA idealize path for a few replicas and compare
against the TPU fused run's saved arrays (replica streams are independent
fold_in streams, so replica r matches across ensemble sizes)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from kmc_tpu.config import SimConfig
    from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk

    n_rep = 8
    cfg = SimConfig(fused_align=False)
    state = init_ensemble(cfg, n_rep, seed=0)
    chunk = make_ensemble_chunk(cfg, 20, donate=False)
    st, _ = chunk(state)

    x_cpu = np.asarray(st.a_xy)
    t_cpu = np.asarray(st.a_trans)
    x_tpu = np.load("/tmp/fused_tpu_axy20.npy")[:n_rep]
    t_tpu = np.load("/tmp/fused_tpu_atrans20.npy")[:n_rep]

    dx = np.abs(x_cpu - x_tpu)
    print(f"max|xy cpu-tpu| = {dx.max():.6f} A   mean = {dx.mean():.6f}")
    same_bonds = (t_cpu == t_tpu).mean()
    print(f"trans-partner agreement: {same_bonds*100:.2f}%  "
          f"(cpu bonds={int((t_cpu>=0).sum())}, tpu bonds={int((t_tpu>=0).sum())})")


if __name__ == "__main__":
    main()
