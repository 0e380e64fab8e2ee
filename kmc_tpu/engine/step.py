"""Step driver (components C19 + L6 of SURVEY.md §1).

One MC timestep, mirroring the reference loop structure (main.cpp:461-2308):

  cluster detection -> diffusion sweep -> geometry idealization ->
  reaction sweep -> commit (functional update) -> observables

The whole step is one jitted function; ``run_chunk`` wraps ``out_every``
steps in a lax.scan so the hot loop never leaves the device, and the host
only sees one state + one observable row per output interval — the TPU
analogue of the reference's every-5000-steps I/O cadence (main.cpp:2206).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from kmc_tpu import rng
from kmc_tpu.config import SimConfig
from kmc_tpu.engine.align import idealize, idealize_fused
from kmc_tpu.engine.clusters import cluster_labels
from kmc_tpu.engine.diffusion import diffuse
from kmc_tpu.engine.observables import Observables, cluster_stats, observe
from kmc_tpu.engine.reactions import react
from kmc_tpu.state import SimState


def step_fn(state: SimState, cfg: SimConfig, rp=None):
    """One MC timestep: SimState -> (SimState, Observables).

    ``rp`` (engine/params.RuntimeParams) optionally overrides the traced
    physics parameters — vmap over it for heterogeneous parameter sweeps."""
    skey = rng.step_key(state.key, state.step)
    info = cluster_labels(state, cfg)

    _, max_b = cluster_stats(info, cfg)
    max_c = jnp.maximum(state.max_complex, max_b)

    st = diffuse(state, info, rng.stream_key(skey, rng.STREAM_MOVE), cfg, rp)
    # the fused Pallas core only pays off on real TPU hardware; off-TPU it
    # would run in interpret mode (minutes of compile for zero benefit), so
    # fall back to the numerically-equivalent XLA path there
    use_fused = cfg.fused_align and jax.default_backend() == "tpu"
    align = idealize_fused if use_fused else idealize
    st = align(st, info, rng.stream_key(skey, rng.STREAM_ALIGN), cfg)
    st = react(st, skey, cfg, rp)
    st = st._replace(step=state.step + 1, max_complex=max_c)
    return st, observe(st, info, cfg)


def step_fn_diag(state: SimState, cfg: SimConfig, rp=None):
    """step_fn variant returning per-channel reaction flux diagnostics
    (eligible candidates + accepted events; see reactions.react(diag=True)).
    Used by scripts/chan_flux.py to bisect kinetics-parity deviations
    channel by channel against an instrumented reference build."""
    skey = rng.step_key(state.key, state.step)
    info = cluster_labels(state, cfg)
    _, max_b = cluster_stats(info, cfg)
    max_c = jnp.maximum(state.max_complex, max_b)
    st, residual = diffuse(state, info, rng.stream_key(skey, rng.STREAM_MOVE),
                           cfg, rp, diag=True)
    use_fused = cfg.fused_align and jax.default_backend() == "tpu"
    align = idealize_fused if use_fused else idealize
    st = align(st, info, rng.stream_key(skey, rng.STREAM_ALIGN), cfg)
    st, dg = react(st, skey, cfg, rp, diag=True)
    dg["residual_overlap"] = residual.astype(jnp.int32)
    st = st._replace(step=state.step + 1, max_complex=max_c)
    return st, observe(st, info, cfg), dg


def make_step_fn(cfg: SimConfig) -> Callable[[SimState], tuple]:
    """Jitted single-step function for the given (static) config."""
    return jax.jit(functools.partial(step_fn, cfg=cfg))


def make_chunk_fn(cfg: SimConfig, chunk: Optional[int] = None):
    """Jitted ``chunk``-step advance returning the final step's observables."""
    chunk = chunk or cfg.out_every

    @jax.jit
    def chunk_fn(state: SimState):
        def inner(st, _):
            st2, obs = step_fn(st, cfg)
            return st2, obs

        state, obs = jax.lax.scan(inner, state, None, length=chunk)
        return state, jax.tree.map(lambda x: x[-1], obs)

    return chunk_fn


def _zero_obs() -> Observables:
    zf = jnp.zeros((), jnp.float32)
    zi = jnp.zeros((), jnp.int32)
    return Observables(zf, zi, zi, zi, zi, zf, zi)


def make_masked_chunk_fn(cfg: SimConfig):
    """Fixed-shape ``out_every``-slot chunk that executes only the first
    ``todo`` steps (traced scalar) — the tail of a run compiles ONE shape
    regardless of the remainder length, instead of one single-step program
    per distinct tail (minutes each through the TPU-compile tunnel;
    round-1/2 finding).  Returns the observables of step ``todo - 1``."""
    chunk = cfg.out_every

    @jax.jit
    def f(state: SimState, todo):
        def inner(st, i):
            st2, obs = jax.lax.cond(
                i < todo,
                lambda s: step_fn(s, cfg),
                lambda s: (s, _zero_obs()),
                st,
            )
            return st2, obs

        state, obs = jax.lax.scan(inner, state, jnp.arange(chunk))
        last = jax.tree.map(
            lambda x: jax.lax.dynamic_index_in_dim(
                x, jnp.maximum(todo - 1, 0), keepdims=False
            ),
            obs,
        )
        return state, last

    return f


def run(
    state: SimState,
    cfg: SimConfig,
    n_steps: Optional[int] = None,
    on_output: Optional[Callable[[SimState, Observables], None]] = None,
) -> SimState:
    """Advance ``n_steps`` (default cfg.simu_step), invoking ``on_output``
    with (state, observables) every ``cfg.out_every`` steps — the hook the
    I/O layer (io/writers.py) plugs into, replacing main.cpp:2206-2305."""
    n_steps = n_steps if n_steps is not None else cfg.simu_step
    chunk_fn = make_chunk_fn(cfg)
    masked_fn = None

    done = 0
    while done < n_steps:
        todo = min(cfg.out_every, n_steps - done)
        if todo == cfg.out_every:
            state, obs = chunk_fn(state)
        else:
            if masked_fn is None:
                masked_fn = make_masked_chunk_fn(cfg)
            state, obs = masked_fn(state, jnp.asarray(todo, jnp.int32))
        done += todo
        if on_output is not None:
            on_output(state, obs)
    return state
