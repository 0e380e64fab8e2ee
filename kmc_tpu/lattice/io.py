"""Lattice engine I/O: time series, checkpoints.

``lattice.dat`` row: step (events in rejection-free mode), particle count,
MSD, species histogram 1..MAX_SPECIES, simulated time — the lattice
analogue of bond.dat (oligomer size is the species, so the histogram IS
the cluster-size distribution).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

import jax.numpy as jnp

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import (
    LatticeState,
    msd,
    particle_count,
    species_histogram,
)


def append_lattice_dat(path: str, state: LatticeState) -> None:
    hist = np.asarray(species_histogram(state))[1:]
    with open(path, "a") as f:
        f.write(
            f"{int(state.step)} {int(particle_count(state))} "
            f"{float(msd(state)):.4f} "
            + " ".join(str(int(x)) for x in hist)
            + f" {float(state.time):.4f}\n"
        )


def save_lattice(path: str, state: LatticeState) -> None:
    arrays = {f: np.asarray(v) for f, v in state._asdict().items()}
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_lattice(path: str) -> LatticeState:
    z = np.load(path)
    fields = {f: jnp.asarray(z[f]) for f in LatticeState._fields if f in z}
    # checkpoints written before the continuous-time field: resume the
    # time axis from the (fixed-dt) step counter
    fields.setdefault("time", fields["step"].astype(jnp.float32))
    return LatticeState(**fields)


class LatticeOutputSet:
    def __init__(self, out_dir: str, cfg: LatticeConfig, fresh: bool = True):
        self.cfg = cfg
        os.makedirs(out_dir, exist_ok=True)
        self.dat = os.path.join(out_dir, "lattice.dat")
        self.ckpt = os.path.join(out_dir, "lattice_checkpoint.npz")
        if fresh:
            open(self.dat, "w").close()

    def __call__(self, state: LatticeState) -> None:
        append_lattice_dat(self.dat, state)
        save_lattice(self.ckpt, state)
