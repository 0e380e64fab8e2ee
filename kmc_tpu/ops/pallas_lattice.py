"""Fused Pallas TPU kernel for the lattice diffusion-reaction step.

One kernel invocation performs the whole timestep — uniform generation
(counter hash on global coordinates), both signed hop passes, merge and
split — entirely in VMEM, writing the grid exactly once to HBM.  The XLA
path (lattice/step.py) materializes the three uniform fields and several
intermediate grids in HBM; for an H x W grid that is ~10 array round-trips
of HBM traffic per step, which this kernel collapses to one read + one
write of grid/disp.  Trajectories are BITWISE IDENTICAL to the XLA path:
both consume the same stateless per-cell hash streams (ops/hashing.py) —
asserted in tests/test_pallas_lattice.py.

Direction control flow is resolved at trace time: the step's (hop axis,
reaction direction) pair selects one of 8 statically-shifted kernel
variants via lax.switch (XLA semantics: no data-dependent control flow
inside a kernel; pallas_guide.md "Common Pitfalls" #7).

Grid blocks must fit VMEM (<= ~1024 x 1024 int32 per shard); larger
lattices shard over an ('x','y') mesh first (parallel/halo.py) so each
device's block stays VMEM-sized — the BASELINE config-5 shape (8192^2 over
a pod slice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmc_tpu.config import LatticeConfig
from kmc_tpu.lattice.grid import LatticeState
from kmc_tpu.lattice.step import (
    SALT_HOP,
    SALT_MERGE,
    SALT_SIGN,
    SALT_SPLIT,
    _hop_pass,
    _parity_mask_global,
    _react_substep,
    step_controls,
)
from kmc_tpu.ops.hashing import cell_uniform

_DIR_TUPLES = ((0, 1), (1, 0), (0, -1), (-1, 0))


def _step_core(grid, disp, step, seed, row0, col0, par_off_rct,
               hop_axis: int, rct_dir: int, cfg: LatticeConfig):
    """The full step with STATIC directions (shared by all kernel variants)."""
    h, w = grid.shape
    fh, fw = cfg.height, cfg.width
    salt = seed * 16

    u = cell_uniform((h, w), step, salt + SALT_HOP, row0, col0, fh, fw) \
        / jnp.float32(cfg.hop_prob)
    u_sgn = cell_uniform((h, w), step, salt + SALT_SIGN, row0, col0, fh, fw)

    attempt = (grid > 0) & (u * jnp.maximum(grid, 1) < 1.0)
    sgn_pos = u_sgn < 0.5
    d_pos = (hop_axis, 1 - hop_axis)
    d_neg = (-hop_axis, hop_axis - 1)
    moved = jnp.zeros_like(grid, bool)
    grid, disp, moved = _hop_pass(grid, disp, moved, attempt & sgn_pos, d_pos)
    grid, disp, moved = _hop_pass(grid, disp, moved, attempt & ~sgn_pos, d_neg)

    u_m = cell_uniform((h, w), step, salt + SALT_MERGE, row0, col0, fh, fw)
    u_s = cell_uniform((h, w), step, salt + SALT_SPLIT, row0, col0, fh, fw)
    par_rct = _parity_mask_global(h, w, row0, col0, rct_dir % 2 == 1,
                                  par_off_rct)
    grid, disp = _react_substep(grid, disp, u_m, u_s, _DIR_TUPLES[rct_dir],
                                par_rct, cfg)
    return grid, disp


def _kernel(scal_ref, grid_ref, disp_ref, out_g_ref, out_d_ref,
            *, hop_axis, rct_dir, cfg):
    step = scal_ref[0]
    seed = scal_ref[1]
    row0 = scal_ref[2]
    col0 = scal_ref[3]
    par_off = scal_ref[4]
    g, d = _step_core(grid_ref[:], disp_ref[:], step, seed, row0, col0,
                      par_off, hop_axis, rct_dir, cfg)
    out_g_ref[:] = g
    out_d_ref[:] = d


def _variant(hop_axis, rct_dir, cfg, shape, interpret):
    h, w = shape
    return pl.pallas_call(
        functools.partial(_kernel, hop_axis=hop_axis, rct_dir=rct_dir, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w, 2), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


def padded_block_call(cfg: LatticeConfig, grid, disp, step, seed,
                      dir_idx, par_off, row0, col0,
                      interpret: bool | None = None):
    """Kernel invocation on an arbitrary (halo-padded) block with explicit
    global origin — the shard_map building block (parallel/halo.py).
    Traceable: usable inside shard_map/jit; directions resolve via
    lax.switch over the 8 static variants."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = grid.shape
    scal = jnp.stack(
        [step, seed, row0, col0, par_off[1]]
    ).astype(jnp.int32)
    hop_axis = dir_idx[0] % 2
    rct_dir = dir_idx[1]
    branches = []
    for ha in range(2):
        for rd in range(4):
            call = _variant(ha, rd, cfg, shape, interpret)
            branches.append(lambda s, g, d, call=call: call(s, g, d))
    return jax.lax.switch(hop_axis * 4 + rct_dir, branches, scal, grid, disp)


def tiled_block_call(cfg: LatticeConfig, grid, disp, step, seed,
                     dir_idx, par_off, row0, col0, tile=(128, 128),
                     interpret: bool | None = None,
                     prepadded: bool = False):
    """Advance an arbitrary block by ONE step as a grid of VMEM-sized
    tiles, each padded with width-4 periodic ghosts and invoked at its
    global origin.  Mosaic allocates scoped VMEM per live value without
    cross-chain reuse, so the whole-grid kernel runs out at just 256^2
    (measured 163.9 MB of 128 MB on v5e); 128^2 tiles keep every
    invocation at ~40 MB.  Counter-hash randomness on global (mod-box)
    coordinates makes the tiling trajectory-invariant — the same rule that
    makes the cross-device halo composition exact (parallel/halo.py)."""
    if prepadded:
        # caller supplies a width-4-ghosted block (halo composition); the
        # interior is (h-8, w-8) and ghosts come from the input, not wrap
        gp, dp = grid, disp
        h, w = grid.shape[0] - 8, grid.shape[1] - 8
        row0, col0 = row0 + 4, col0 + 4       # origin of the interior
    else:
        h, w = grid.shape
        gp = dp = None
    def fit(dim, t):
        """Largest tile <= t that divides dim (ADVICE r3: sizes that are
        > tile but not a multiple of it, e.g. 192 or 320, must fall back
        to a divisor tile instead of failing at trace time)."""
        t = min(t, dim)
        while dim % t:
            t -= 1
        return t

    th, tw = fit(h, tile[0]), fit(w, tile[1])
    if min(th, tw) < 8 and (h, w) != (th, tw):
        # prime/near-prime dims degrade to ~1-wide divisor tiles — a
        # pathological grid for the kernel (ADVICE r4).  For an unghosted
        # block within the VMEM-safe whole-grid range, fall back to ONE
        # whole-grid padded call; otherwise reject loudly instead of
        # silently running h*w near-scalar invocations.
        assert not prepadded and max(h, w) <= 192, (
            f"tiled_block_call: no usable tile divides ({h}, {w}) "
            f"(best {th}x{tw}); pad the block to a composite size")
        return padded_block_call(cfg, grid, disp, step, seed, dir_idx,
                                 par_off, row0, col0, interpret=interpret)
    if not prepadded and (th, tw) == (h, w):
        return padded_block_call(cfg, grid, disp, step, seed, dir_idx,
                                 par_off, row0, col0, interpret=interpret)
    if gp is None:
        gp = jnp.pad(grid, 4, mode="wrap")
        dp = jnp.pad(disp, ((4, 4), (4, 4), (0, 0)), mode="wrap")
    grows, drows = [], []
    for ti in range(h // th):
        gcols, dcols = [], []
        for tj in range(w // tw):
            gb = gp[ti * th: ti * th + th + 8, tj * tw: tj * tw + tw + 8]
            db = dp[ti * th: ti * th + th + 8, tj * tw: tj * tw + tw + 8]
            go, do = padded_block_call(
                cfg, gb, db, step, seed, dir_idx, par_off,
                row0 + ti * th - 4, col0 + tj * tw - 4, interpret=interpret,
            )
            gcols.append(go[4:-4, 4:-4])
            dcols.append(do[4:-4, 4:-4])
        grows.append(jnp.concatenate(gcols, axis=1))
        drows.append(jnp.concatenate(dcols, axis=1))
    return jnp.concatenate(grows, axis=0), jnp.concatenate(drows, axis=0)


# default tile: VMEM-sized (see tiled_block_call); override for experiments
import os as _os

TILE = int(_os.environ.get("KMC_LAT_TILE", "128"))


def pallas_lattice_step(state: LatticeState, cfg: LatticeConfig,
                        interpret: bool | None = None,
                        tile=None) -> LatticeState:
    """One fused-kernel step, trajectory-identical to lattice_step."""
    tile = tile or (TILE, TILE)
    dir_idx, par_off = step_controls(state)
    grid, disp = tiled_block_call(
        cfg, state.grid, state.disp, state.step, state.seed,
        dir_idx, par_off, jnp.int32(0), jnp.int32(0), tile=tile,
        interpret=interpret,
    )
    return state._replace(grid=grid, disp=disp, step=state.step + 1,
                          time=state.time + 1.0)


def make_pallas_lattice_step(cfg: LatticeConfig, interpret: bool | None = None):
    """Jitted fused-kernel step, trajectory-identical to lattice_step."""
    return jax.jit(functools.partial(pallas_lattice_step, cfg=cfg,
                                     interpret=interpret))


def make_pallas_lattice_chunk(cfg: LatticeConfig, chunk: int,
                              interpret: bool | None = None):
    """Jitted ``chunk``-step advance of the fused kernel under one lax.scan —
    the hot loop never leaves the device (one dispatch per chunk, matching
    lattice/step.make_lattice_chunk; the CLI uses this, not a Python loop)."""

    @jax.jit
    def f(state: LatticeState) -> LatticeState:
        def inner(st, _):
            return pallas_lattice_step(st, cfg, interpret=interpret), None

        state, _ = jax.lax.scan(inner, state, None, length=chunk)
        return state

    return f
