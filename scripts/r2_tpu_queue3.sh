#!/bin/bash
# Round-2 TPU queue #3 (post-validation): diffuse-stage decomposition,
# lattice-engine benches (XLA vs fused Pallas; pod-scale grid), and a
# re-profile of the full step after whatever default wins.
set -u
cd /root/repo

echo "=== 1. diffuse collision variants ==="
timeout 3000 python scripts/bench_diffuse_tpu.py 2>&1
echo "=== diffuse rc=$? ==="

echo "=== 2. lattice benches (512^2; then the BASELINE config-5 8192^2 grid) ==="
timeout 3600 python scripts/bench_lattice_tpu.py 2>&1
echo "=== lattice rc=$? ==="
KMC_LAT_SIZE=8192 KMC_LAT_CHUNK=50 KMC_LAT_REPEATS=2 \
  timeout 3600 python scripts/bench_lattice_tpu.py 2>&1
echo "=== lattice8192 rc=$? ==="

echo "=== 2b. align-kernel block-size sweep ==="
for RB in 16 32; do
  echo "--- KMC_ALIGN_RB=$RB ---"
  KMC_ALIGN_RB=$RB KMC_BENCH_MODE=eager KMC_BENCH_REPLICAS=256 \
    KMC_BENCH_CHUNK=20 KMC_BENCH_REPEATS=3 timeout 3000 python bench.py 2>&1
  echo "--- rc=$? ---"
done

echo "=== 3. full-step re-profile ==="
timeout 3000 python scripts/profile_step_tpu.py 2>&1
echo "=== profile rc=$? ==="
echo "=== queue3 done ==="
