#!/bin/bash
# Round-3 TPU queue #1: diffuse decomposition after the label-space sweep
# rewrite, full-step re-profile, fresh bench headline, lattice benches
# (512^2 XLA vs Pallas, then the BASELINE config-5 8192^2 grid).
# One TPU process at a time (axon); run exclusively.
set -u
cd /root/repo

echo "=== 1. diffuse collision variants (label-space sweep) ==="
timeout 3000 python scripts/bench_diffuse_tpu.py 2>&1
echo "=== diffuse rc=$? ==="

echo "=== 2. full-step profile ==="
timeout 3000 python scripts/profile_step_tpu.py 2>&1
echo "=== profile rc=$? ==="

echo "=== 3. bench headline (lazy default) ==="
timeout 1200 python bench.py 2>&1
echo "=== bench rc=$? ==="

echo "=== 4. lattice 512^2 XLA vs Pallas ==="
timeout 3600 python scripts/bench_lattice_tpu.py 2>&1
echo "=== lattice512 rc=$? ==="

echo "=== 5. lattice 8192^2 (BASELINE config 5) ==="
KMC_LAT_SIZE=8192 KMC_LAT_CHUNK=50 KMC_LAT_REPEATS=2 \
  timeout 3600 python scripts/bench_lattice_tpu.py 2>&1
echo "=== lattice8192 rc=$? ==="
echo "=== queue1 done ==="
