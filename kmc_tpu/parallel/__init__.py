"""Parallelism layers: device meshes, replica ensembles, halo exchange."""
