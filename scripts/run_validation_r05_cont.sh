#!/bin/bash
# Round-5 gap-closing continuation (VERDICT r4 missing #3, rows 571+):
# the from-scratch round-5 ensemble's resume state was lost to the
# between-session /tmp wipe at output row 571, so this run re-anchors at
# our OWN replica-0 reference-format checkpoint from that row
# (out/flagship_r05/position.cpt, step 2,855,000), broadcasts it to 256
# replicas, and drives the ensemble through every oracle row past the
# anchor — covering rows 572 -> the oracles' live depth (931+/875+ and
# accumulating) with ALL 7 bond.dat columns + cluster-size and
# receptor-oligomer histograms vs BOTH oracles.  Because the anchor is a
# single broadcast state (not each oracle's own), the first rows have a
# near-zero ensemble band; --skip-initial masks a declared 40-row
# (200k-step) decorrelation burn-in in the report.  Replica-0 outputs are
# written to out/flagship_r05_cont for appending to the flagship file set.
cd /root/repo
exec python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refgolden/bond.dat /tmp/refgolden2/bond.dat \
  --ref-cluster /tmp/refgolden/cluster.log /tmp/refgolden2/cluster.log \
  --init-cpt out/flagship_r05/position.cpt \
  --replicas 256 --align-mode lazy --sub-chunks 4 --seed 21 \
  --skip-initial 40 --max-rows 500 \
  --state-file /tmp/val_r05c_state.npz --resume-state \
  --write-outputs out/flagship_r05_cont \
  --out VALIDATION_r05_cont.json
