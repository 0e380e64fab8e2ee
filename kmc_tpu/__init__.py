"""kmc_tpu — a TPU-native kinetic Monte Carlo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``xiaopuren/KMC-with-a-diffusion-reaction-algorithm`` (a fixed-timestep
diffusion–reaction simulator of TNF-receptor/ligand oligomerization,
reference: /root/reference/main.cpp).  The reference is a single-threaded
C++ translation unit; this framework re-builds every component TPU-first:

* dense struct-of-array state pytrees instead of global AoS arrays
  (reference main.cpp:101-168),
* counter-based Threefry RNG streams instead of a clock-re-seeded
  mt19937_64 (main.cpp:2313-2326),
* synchronous per-cluster rigid-move proposals with parallel conflict
  resolution instead of a Gauss-Seidel molecule sweep (main.cpp:577-1872),
* a vectorized constraint-projection "idealize" pass instead of the
  goto-retry alignment cascade (main.cpp:1284-1732),
* mutual-argmax reaction matching instead of sequential pair scans
  (main.cpp:1874-2141),
* vmapped replica ensembles + jax.sharding meshes for scale-out,
* a lattice diffusion–reaction engine (occupancy grids, Pallas hop and
  reaction kernels, ppermute halo exchange) for large-system scaling.
"""

from kmc_tpu.config import SimConfig, LatticeConfig
from kmc_tpu.state import SimState, init_state
from kmc_tpu.engine.step import make_step_fn, run
from kmc_tpu.engine.params import RuntimeParams
from kmc_tpu.lattice.grid import LatticeState, init_lattice
from kmc_tpu.lattice.step import make_lattice_step
from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_step

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "LatticeConfig",
    "SimState",
    "LatticeState",
    "RuntimeParams",
    "init_state",
    "init_lattice",
    "init_ensemble",
    "make_step_fn",
    "make_lattice_step",
    "make_ensemble_step",
    "run",
]
