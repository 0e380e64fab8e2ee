#!/usr/bin/env python
"""Time the lattice engine on TPU: XLA path vs fused Pallas kernel.

One JSON line per config: {"path", "steps_per_s", "site_updates_per_s"}.
Run exclusively (one TPU process at a time).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

H = W = int(os.environ.get("KMC_LAT_SIZE", "512"))
CHUNK = int(os.environ.get("KMC_LAT_CHUNK", "200"))
REPEATS = int(os.environ.get("KMC_LAT_REPEATS", "3"))


def run(use_pallas: bool):
    from kmc_tpu.config import LatticeConfig
    from kmc_tpu.lattice.grid import init_lattice
    from kmc_tpu.lattice.step import make_lattice_step
    from kmc_tpu.ops.pallas_lattice import make_pallas_lattice_step

    cfg = LatticeConfig(height=H, width=W)
    state = init_lattice(cfg, seed=0)
    state = jax.block_until_ready(state)
    if use_pallas:
        one = make_pallas_lattice_step(cfg)
    else:
        one = make_lattice_step(cfg)

    @jax.jit
    def chunk(st):
        return jax.lax.fori_loop(0, CHUNK, lambda i, s: one(s), st)

    t0 = time.perf_counter()
    state = jax.block_until_ready(chunk(state))
    print(f"# pallas={use_pallas} compile+first-chunk: "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        state = chunk(state)
    state = jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps = REPEATS * CHUNK
    sps = steps / dt
    print(json.dumps({
        "path": "pallas" if use_pallas else "xla",
        "steps_per_s": round(sps, 1),
        "site_updates_per_s": f"{sps * H * W:.3e}",
    }), flush=True)
    return sps


if __name__ == "__main__":
    print(f"# backend: {jax.default_backend()}  grid {H}x{W}",
          file=sys.stderr, flush=True)
    s_xla = run(False)
    s_pal = run(True)
    print(json.dumps({"pallas_speedup": round(s_pal / s_xla, 2)}), flush=True)
