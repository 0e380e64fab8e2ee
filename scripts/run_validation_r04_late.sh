#!/bin/bash
# Late-horizon anchor continuation (VERDICT r3 #1, late-time behavior):
# snapshot the live oracle's position.cpt + subsequent bond/cluster rows,
# broadcast the checkpoint to a 256-replica ensemble, and test the
# oracle's ONWARD trajectory (deep in coarsening, ~2.5M+ ns) against the
# ensemble band.  Chunk shapes are already compiled by the main run.
set -e
cd /root/repo
# the anchor cpt (/tmp/valsnap_late/cpt, oracle step 2,790,000 = output row
# 558) was snapshotted at 12:15; the oracle keeps appending rows past it,
# and this script refreshes the comparison files at launch time
cp /tmp/refgolden/bond.dat /tmp/valsnap_late/bond.dat
cp /tmp/refgolden/cluster.log /tmp/valsnap_late/cluster.log
exec python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/valsnap_late/bond.dat \
  --ref-cluster /tmp/valsnap_late/cluster.log \
  --init-cpt /tmp/valsnap_late/cpt \
  --replicas 256 --align-mode lazy --sub-chunks 4 --seed 11 \
  --max-rows 60 \
  --state-file /tmp/val_r04_late_state.npz --resume-state \
  --out VALIDATION_r04_late.json
