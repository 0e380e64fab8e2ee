#!/bin/bash
# Round-4 full-horizon validation (VERDICT r3 #1): 256-replica lazy ensemble
# vs BOTH golden oracles (kinetics + cluster-size distributions) over the
# accumulated horizon snapshot, writing replica 0's full reference-
# compatible output file set as the flagship-run evidence (r3 #6).
cd /root/repo
exec python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/valsnap/g1_bond.dat /tmp/valsnap/g2_bond.dat \
  --ref-cluster /tmp/valsnap/g1_cluster.log /tmp/valsnap/g2_cluster.log \
  --replicas 256 --align-mode lazy --sub-chunks 4 --seed 0 \
  --max-rows 440 \
  --state-file /tmp/val_r04_state.npz --resume-state \
  --write-outputs out/flagship_r04 \
  --out VALIDATION_r04.json
