"""Particle engine: init, clusters, diffusion, alignment, reactions, step."""
