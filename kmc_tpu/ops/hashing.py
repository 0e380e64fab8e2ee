"""Stateless per-cell counter-based uniforms.

The lattice engine needs a uniform draw per (cell, step, substream) that is
*identical* no matter how the grid is sharded, computed locally by whichever
device owns (or halos) the cell — including inside Pallas kernels where
jax.random is unavailable.  The construction is a counter-based integer
hash of (global cell index, step, stream salt): two multiply-xor-shift
avalanche rounds (xxhash/murmur finalizer family), which passes the
engine's statistical validation (MSD slope, reaction equilibrium,
uniformity tests in test_hashing.py).

This replaces the reference's clock-re-seeded mt19937_64 (main.cpp:2313)
for the lattice path; the particle engine keeps jax.random Threefry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# python-int constants: folded as literals at trace time (module-level jnp
# arrays would be captured consts, which Pallas kernels reject)
_M1 = 0x2C1B3C6D
_M2 = 0x297A2D39
_STEP_P = 0x9E3779B1   # golden-ratio prime
_SALT_P = 0x85EBCA77


def _avalanche(x):
    x = x ^ (x >> 15)
    x = x * jnp.uint32(_M1)
    x = x ^ (x >> 12)
    x = x * jnp.uint32(_M2)
    x = x ^ (x >> 15)
    return x


def hash_u32(counter, step, salt):
    """uint32 hash of (counter, step, salt); all args broadcastable,
    salt may be a python int or a traced int32 (e.g. seed*streams+stream)."""
    salt = jnp.asarray(salt).astype(jnp.uint32)
    x = counter.astype(jnp.uint32)
    x = x + step.astype(jnp.uint32) * jnp.uint32(_STEP_P)
    x = x + salt * jnp.uint32(_SALT_P)
    x = _avalanche(x)
    # second round keyed differently to decorrelate consecutive counters
    x = _avalanche(x ^ (step.astype(jnp.uint32) + salt))
    return x


def cell_uniform(shape, step, salt, row0=0, col0=0,
                 full_height=None, full_width=None):
    """Uniforms in [0,1) for a (h, w) block of a conceptually global grid.

    row0/col0: global coordinates of the block's [0,0] cell (static or
    traced; may be negative for halo rows — coordinates wrap modulo the
    full grid when full_height/full_width are given).  Cells with the same
    global coordinates hash identically on every device and in every halo
    copy — the property that makes domain decomposition trajectory-exact.
    """
    h, w = shape
    fh = full_height if full_height is not None else h
    fw = full_width if full_width is not None else w
    gy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + jnp.asarray(
        row0, jnp.int32
    )
    gx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + jnp.asarray(
        col0, jnp.int32
    )
    gy = jnp.mod(gy, fh).astype(jnp.uint32)
    gx = jnp.mod(gx, fw).astype(jnp.uint32)
    counter = gy * jnp.uint32(fw) + gx
    bits = hash_u32(counter, jnp.asarray(step), salt)
    return _bits_to_uniform(bits)


def _bits_to_uniform(bits):
    """uint32 bits -> uniform [0,1) via the top 24 bits.  Goes through int32
    (Mosaic/Pallas supports int32->f32 but not uint32->f32), and 24 bits is
    the full f32 mantissa anyway."""
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * \
        jnp.float32(2.0**-24)


def scalar_uniforms(n, step, salt):
    """n scalar uniforms for per-step global draws (direction, parity)."""
    c = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(0xDEADBEEF)
    return _bits_to_uniform(hash_u32(c, jnp.asarray(step), salt))
