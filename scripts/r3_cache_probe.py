#!/usr/bin/env python
"""Probe: does the axon TPU backend support the persistent compilation cache?

Run twice (two fresh processes).  First run compiles and should populate
/root/repo/.jax_cache; second run should hit the cache and compile fast.
Prints the compile wall time and the cache dir contents.
"""
import os
import sys
import time

import jax

CACHE_DIR = "/root/repo/.jax_cache"

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

print("devices:", jax.devices(), file=sys.stderr)


@jax.jit
def f(x):
    return jnp.sin(x) @ jnp.cos(x).T + 17.0


x = jnp.ones((384, 384), jnp.float32)
t0 = time.perf_counter()
f(x).block_until_ready()
dt = time.perf_counter() - t0
print(f"first-call (compile+run) time: {dt:.2f}s")
entries = os.listdir(CACHE_DIR) if os.path.isdir(CACHE_DIR) else []
print(f"cache entries: {len(entries)}")
for e in entries[:5]:
    p = os.path.join(CACHE_DIR, e)
    print(" ", e, os.path.getsize(p))
