"""Runtime (traced) physics parameters.

``SimConfig`` fields are jit-static compile-time constants (the ``#define``
analogue).  ``RuntimeParams`` lifts the *continuous* physics — diffusion
coefficients and per-step reaction probabilities — into traced values, so a
single compiled step can run heterogeneous parameter sets across replicas
(vmap over params): the expert-parallel analogue of SURVEY.md §2 —
parameter sweeps sharded over the mesh with one executable.

Shapes/counts/cutoffs stay static (they set array sizes and gate geometry).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from kmc_tpu.config import SimConfig


class RuntimeParams(NamedTuple):
    rb_a_d: jax.Array
    rb_a_rot_d: jax.Array
    rb_b_d: jax.Array
    rb_b_rot_d: jax.Array
    cis_d: jax.Array
    cis_rot_d: jax.Array
    bond_d: jax.Array
    bond_rot_d: jax.Array
    p_trans_ass: jax.Array
    p_trans_diss: jax.Array
    p_mono_cis_ass: jax.Array
    p_mono_cis_diss: jax.Array
    p_cis_ass: jax.Array
    p_cis_diss: jax.Array


def from_config(cfg: SimConfig) -> RuntimeParams:
    f = jnp.float32
    return RuntimeParams(
        rb_a_d=f(cfg.rb_a_d),
        rb_a_rot_d=f(cfg.rb_a_rot_d),
        rb_b_d=f(cfg.rb_b_d),
        rb_b_rot_d=f(cfg.rb_b_rot_d),
        cis_d=f(cfg.cis_d),
        cis_rot_d=f(cfg.cis_rot_d),
        bond_d=f(cfg.bond_d),
        bond_rot_d=f(cfg.bond_rot_d),
        p_trans_ass=f(cfg.p_trans_ass),
        p_trans_diss=f(cfg.p_trans_diss),
        p_mono_cis_ass=f(cfg.p_mono_cis_ass),
        p_mono_cis_diss=f(cfg.p_mono_cis_diss),
        p_cis_ass=f(cfg.p_cis_ass),
        p_cis_diss=f(cfg.p_cis_diss),
    )


def sweep(cfg: SimConfig, n: int, **overrides) -> RuntimeParams:
    """Batched params: base values broadcast to [n], with per-replica arrays
    for any overridden field, e.g. ``sweep(cfg, 8, p_trans_ass=grid)``."""
    base = from_config(cfg)
    out = {}
    for field in RuntimeParams._fields:
        if field in overrides:
            v = jnp.asarray(overrides[field], jnp.float32)
            assert v.shape == (n,), (field, v.shape)
            out[field] = v
        else:
            out[field] = jnp.broadcast_to(getattr(base, field), (n,))
    return RuntimeParams(**out)
