#!/bin/bash
# Round-5 late-horizon continuation vs ORACLE 2, oracle-anchored (same
# design as run_validation_r05_late.sh): broadcast oracle 2's own
# committed position.cpt (git 506123b snapshot, step 4,000,000 = output
# row 800) to 256 replicas and band-test its onward rows (801 -> live
# depth) against the conditional ensemble.
cd /root/repo
exec python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refgolden2/bond.dat \
  --ref-cluster /tmp/refgolden2/cluster.log \
  --init-cpt /tmp/anchor800/cpt \
  --replicas 256 --align-mode lazy --sub-chunks 4 --seed 41 \
  --state-file /tmp/val_r05e_state.npz --resume-state \
  --out VALIDATION_r05_late2.json
