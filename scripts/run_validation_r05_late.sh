#!/bin/bash
# Round-5 late-horizon continuation, oracle-anchored (the methodology that
# round 4 proved out): broadcast ORACLE 1'S OWN committed position.cpt
# (git 506123b snapshot, step 4,270,000 = output row 854) to 256 replicas
# and band-test the oracle's onward rows (855 -> its live depth) against
# the conditional ensemble.  Because the anchor is the oracle's own state,
# its onward trajectory is exactly "one more replica" of the conditional
# process — no burn-in needed, and the running-max column max_complex is
# well-posed (the anchor cpt carries the oracle's own running max).
# This replaced an own-state-anchored attempt whose band comparison is
# ill-posed for slow modes (OWN_ANCHOR_NEGATIVE_r05.json documents it).
cd /root/repo
exec python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refgolden/bond.dat \
  --ref-cluster /tmp/refgolden/cluster.log \
  --init-cpt /tmp/anchor854/cpt \
  --replicas 256 --align-mode lazy --sub-chunks 4 --seed 31 \
  --state-file /tmp/val_r05d_state.npz --resume-state \
  --out VALIDATION_r05_late.json
