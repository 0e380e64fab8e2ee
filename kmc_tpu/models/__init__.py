"""Model families: rigid-body molecule geometries and lattice species."""
