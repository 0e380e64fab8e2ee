#!/bin/bash
# Round-3 TPU queue #2: lattice Pallas kernel (post zero-shift-roll fix),
# rejection-free throughput, diffuse sub-stage ablation.
set -u
cd /root/repo

echo "=== 1. lattice 512^2 (XLA cached + fixed Pallas) ==="
timeout 3600 python scripts/bench_lattice_tpu.py 2>&1
echo "=== lattice512 rc=$? ==="

echo "=== 2. lattice 8192^2 ==="
KMC_LAT_SIZE=8192 KMC_LAT_CHUNK=50 KMC_LAT_REPEATS=2 \
  timeout 3600 python scripts/bench_lattice_tpu.py 2>&1
echo "=== lattice8192 rc=$? ==="

echo "=== 3. rejection-free throughput (serial / batched / fixed-dt) ==="
timeout 3000 python scripts/bench_rf_tpu.py 2>&1
echo "=== rf rc=$? ==="

echo "=== 4. diffuse sub-stage ablation ==="
timeout 3000 python scripts/ablate_diffuse_tpu.py 2>&1
echo "=== ablate rc=$? ==="
echo "=== queue2 done ==="
