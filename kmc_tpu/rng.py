"""Counter-based RNG streams (component C3 of SURVEY.md §2).

The reference's ``rand2()`` re-seeds a fresh mt19937_64 from the nanosecond
clock on EVERY call (main.cpp:2313-2326) — irreproducible by construction.
Here every random draw comes from a Threefry key derived deterministically
from ``(base_seed, step, stream)`` so runs are bitwise reproducible, replicas
are independent, and checkpoint/resume restores the exact stream position.
"""

from __future__ import annotations

import jax

# Stable stream identifiers.  Adding new streams is append-only; reordering
# would silently change trajectories of fixed seeds.
STREAM_INIT = 0
STREAM_MOVE = 1
STREAM_REACT_TRANS = 2
STREAM_REACT_MONO_CIS = 3
STREAM_REACT_CIS = 4
STREAM_DISS_TRANS = 5
STREAM_DISS_MONO_CIS = 6
STREAM_DISS_CIS = 7
STREAM_ALIGN = 8
STREAM_LATTICE = 9


def base_key(seed: int):
    return jax.random.key(seed)


def replica_key(key, replica: int):
    """Independent per-replica stream (ensemble data parallelism)."""
    return jax.random.fold_in(key, replica)


def step_key(key, step):
    """Per-timestep subkey; ``step`` may be a traced int32."""
    return jax.random.fold_in(key, step)


def stream_key(skey, stream: int):
    """Per-(step, subsystem) subkey."""
    return jax.random.fold_in(skey, stream)


def tiny_bernoulli(key, p, shape):
    """Bernoulli(p) that resolves p down to ~5e-20 — REQUIRED for the
    reference's dissociation probabilities (Diss_Rate*dt = 3.48e-12,
    main.cpp:91, drawn against a DOUBLE in the reference at :2070).

    A float32 ``uniform(key) < p`` is wrong for such p: the f32 uniform is
    quantized to ~2^-23 with an atom at exactly 0, so the comparison fires
    at ~1e-7 per draw REGARDLESS of p — a ~10^5x overestimate that culls
    slowly-reformed (cis) bonds and was the root cause of the round-2
    bond_cis kinetics failure (CHAN_FLUX_r03: dis_trans 0.56/replica/1e5
    steps vs the reference's ~1e-5).

    Exact construction: two independent 32-bit draws form a 64-bit
    uniform; fire iff (hi, lo) < p * 2^64 split into 32-bit words.  The
    only approximation is representing p * 2^32 in f32 (relative error
    <= 2^-24, i.e. exact for every practical rate)."""
    import jax.numpy as jnp

    kh, kl = jax.random.split(key)
    hi = jax.random.bits(kh, shape, jnp.uint32)
    lo = jax.random.bits(kl, shape, jnp.uint32)
    t = jnp.float32(p) * jnp.float32(4294967296.0)        # p * 2^32
    th = jnp.floor(t)
    tl = jnp.floor((t - th) * jnp.float32(4294967296.0))
    # 4294967040 = largest f32 below 2^32 (cast of >= 2^32 is undefined)
    th32 = jnp.clip(th, 0.0, 4294967040.0).astype(jnp.uint32)
    tl32 = jnp.clip(tl, 0.0, 4294967040.0).astype(jnp.uint32)
    return (hi < th32) | ((hi == th32) & (lo < tl32))
