"""Lattice diffusion-reaction engine: occupancy grids, fused kernels,
domain decomposition.  The scalable counterpart of the particle engine."""
