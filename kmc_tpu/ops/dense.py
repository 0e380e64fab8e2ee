"""Dense one-hot replacements for data-dependent gathers (TPU hot path).

XLA lowers a traced-index gather ``x[idx]`` on TPU to a scalar-core loop
fusion (kind=kCustom): measured 1-3 ms PER GATHER at replica-batch 512 on
v5e for kilobyte outputs, ~40 ms of the round-3 57 ms step
(scripts/trace_step_tpu.py).  With the particle engine's tiny index spaces
(n = 200 molecules), the dense alternative — a one-hot matrix multiplied
against the value table — runs on the MXU in microseconds and vmaps
perfectly.

Exactness: each output row of ``onehot @ values`` is a sum with exactly one
nonzero product, 1.0 * x.  Under ``Precision.HIGHEST`` the TPU's bf16
triple-decomposition represents 1.0 as a single exact term, so every
product 1.0 * x_part and their non-overlapping sum reproduce x bitwise —
these helpers are drop-in replacements for the gather, not approximations
(asserted across engines in tests/test_clusters.py, test_diffusion.py).

Limits: index space n and integer value magnitudes must stay below 2**24
(exact f32 integers), and float value tables must be FINITE everywhere —
0 * inf = NaN poisons the masked matmul even at unselected rows (replace
inf fillers with a finite sentinel before calling ``take``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def onehot(idx, n: int):
    """f32[..., m, n] one-hot rows for integer idx[..., m] in [0, n)."""
    return (idx[..., :, None] == jnp.arange(n, dtype=idx.dtype)).astype(
        jnp.float32
    )


def take(values, oh):
    """Exact ``values[idx]`` for ``oh = onehot(idx, n)``.

    values: [n, ...] of f32 / int (|v| < 2**24) / bool; oh: [m, n] f32.
    Returns [m, ...] with values' dtype, bitwise equal to the gather.
    """
    n = oh.shape[-1]
    flat = values.reshape(n, -1)
    if flat.dtype == jnp.bool_:
        out = jnp.matmul(oh, flat.astype(jnp.float32), precision=_HI) > 0.5
    elif jnp.issubdtype(flat.dtype, jnp.integer):
        out = jnp.matmul(oh, flat.astype(jnp.float32), precision=_HI).astype(
            flat.dtype
        )
    else:
        out = jnp.matmul(oh, flat, precision=_HI).astype(flat.dtype)
    return out.reshape(oh.shape[:-1] + values.shape[1:])


def scatter_or_2d(rows, cols, flags, n_rows: int, n_cols: int):
    """Exact dense form of ``zeros([n_rows, n_cols], bool).at[rows, cols]
    .max(flags)``: out[r, c] = any_i(flags_i & rows_i==r & cols_i==c).

    rows/cols: i32[m]; flags: bool[m].  Scatters with traced indices hit the
    same scalar-core path as gathers; two tiny MXU matmuls replace it.
    """
    ohr = onehot(rows, n_rows) * flags.astype(jnp.float32)[..., :, None]
    ohc = onehot(cols, n_cols)
    hits = jnp.matmul(jnp.swapaxes(ohr, -1, -2), ohc, precision=_HI)
    return hits > 0.5
