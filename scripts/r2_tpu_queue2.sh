#!/bin/bash
# Round-2 TPU queue #2 (after the batched-align Mosaic fixes):
#   0. smoke: tiny vmapped fused chunk (catches Mosaic lowering errors fast)
#   1. eager-vs-lazy alignment bench (eager now uses the replica-batched kernel)
#   2. replica-scaling curve (1024 / 4096 / 16384)
#   3. per-component step profiler
#   4. validation rerun under round-2 defaults (sweep_collisions + batched align)
set -u
cd /root/repo

echo "=== 0. smoke: batched kernel on hardware ==="
timeout 1200 python - <<'EOF' 2>&1
import time, jax
from kmc_tpu.config import SimConfig
from kmc_tpu.parallel.ensemble import init_ensemble, make_ensemble_chunk
cfg = SimConfig()
t0 = time.time()
st = init_ensemble(cfg, 4, seed=0)
chunk = make_ensemble_chunk(cfg, 2, donate=True)
st, obs = chunk(st)
jax.block_until_ready(st)
print(f"smoke ok: backend={jax.default_backend()} t={time.time()-t0:.1f}s")
EOF
echo "=== smoke rc=$? ==="

echo "=== 1. lazy align bench ==="
timeout 3600 python scripts/bench_lazy_tpu.py 2>&1
echo "=== lazy bench rc=$? ==="

echo "=== 2. replica scaling curve ==="
for R in 1024 4096 16384; do
  echo "--- replicas=$R ---"
  KMC_BENCH_REPLICAS=$R KMC_BENCH_CHUNK=20 KMC_BENCH_REPEATS=2 \
    timeout 3000 python bench.py 2>&1
  echo "--- rc=$? ---"
done

echo "=== 3. per-component profiler ==="
timeout 3000 python scripts/profile_step_tpu.py 2>&1
echo "=== profiler rc=$? ==="

echo "=== 4. validation rerun (round-2 defaults) ==="
timeout 14000 python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refsnap/bond.dat \
  --ref-cluster /tmp/refsnap/cluster.log \
  --replicas 64 --max-rows 120 --seed 0 \
  --out /root/repo/VALIDATION_r02b.json 2>&1
echo "=== validation rc=$? ==="
echo "=== queue2 done ==="
