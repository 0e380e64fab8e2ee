#!/bin/bash
# Round-3 TPU queue #3 (trimmed): residual-overlap rate (VERDICT r2 #6)
# and the lattice Pallas retry after the i1-broadcast fix.  The long
# final validation follows as its own job.
set -u
cd /root/repo

echo "=== 1. residual overlap, reference config ==="
timeout 2400 python scripts/measure_residual_overlap.py \
  --replicas 256 --chunks 10 --chunk-steps 500 \
  --out RESIDUAL_OVERLAP_ref.json 2>&1 | tail -4
echo "=== rc=$? ==="

echo "=== 2. residual overlap, 4x dense ==="
timeout 2400 python scripts/measure_residual_overlap.py \
  --replicas 256 --chunks 10 --chunk-steps 500 --dense \
  --out RESIDUAL_OVERLAP_dense.json 2>&1 | tail -4
echo "=== rc=$? ==="

echo "=== 3. lattice Pallas retry (512^2) ==="
timeout 3000 python scripts/bench_lattice_tpu.py 2>&1 | grep -vE "WARNING" \
  | tail -8
echo "=== rc=$? ==="
echo "=== queue3 done ==="
