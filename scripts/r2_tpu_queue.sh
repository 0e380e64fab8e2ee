#!/bin/bash
# Round-2 sequential TPU queue (one TPU process at a time):
#   1. statistical validation vs the golden reference (kinetics + clusters)
#   2. eager-vs-lazy alignment bench
#   3. replica-scaling curve (1024 / 4096 / 16384) via bench.py
set -u
cd /root/repo

echo "=== 1. validation kinetics+clusters ==="
timeout 14000 python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refsnap/bond.dat \
  --ref-cluster /tmp/refsnap/cluster.log \
  --replicas 64 --max-rows 120 --seed 0 \
  --out /root/repo/VALIDATION_r02.json 2>&1
echo "=== validation rc=$? ==="

echo "=== 2. lazy align bench ==="
timeout 3000 python scripts/bench_lazy_tpu.py 2>&1
echo "=== lazy bench rc=$? ==="

echo "=== 3. replica scaling curve ==="
for R in 1024 4096 16384; do
  echo "--- replicas=$R ---"
  KMC_BENCH_REPLICAS=$R KMC_BENCH_CHUNK=20 KMC_BENCH_REPEATS=2 \
    timeout 3000 python bench.py 2>&1
  echo "--- rc=$? ---"
done
echo "=== queue done ==="
