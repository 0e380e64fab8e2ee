#!/bin/bash
# Round-2 TPU job: statistical validation vs the golden reference
# (kinetics quantile-band + cluster-size-distribution TV test).
set -u
cd /root/repo
timeout 14000 python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refsnap/bond.dat \
  --ref-cluster /tmp/refsnap/cluster.log \
  --replicas 64 --max-rows 120 --seed 0 \
  --out /root/repo/VALIDATION_r02.json 2>&1
echo "=== done rc=$? ==="
