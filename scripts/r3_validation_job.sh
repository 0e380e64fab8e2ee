#!/bin/bash
# Round-3 FINAL validation: 256-replica LAZY-mode ensemble (the bench.py
# default — validates the event-driven alignment at ship scale, VERDICT r2
# #5) against BOTH independent golden-oracle trajectories, kinetics +
# cluster-size distributions, full available horizon.  Writes incremental
# partials (VALIDATION_r03.json.partial) so a timeout still leaves
# evidence.
set -u
cd /root/repo
timeout 11000 python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refgolden/bond.dat /tmp/refgolden2/bond.dat \
  --ref-cluster /tmp/refgolden/cluster.log /tmp/refgolden2/cluster.log \
  --replicas 256 --align-mode lazy --seed 1 \
  --out /root/repo/VALIDATION_r03.json 2>&1
echo "=== validation rc=$? ==="
