#!/bin/bash
# Round-5 full-horizon validation (VERDICT r4 #1/#2/#3-row-gaps): resume the
# round-4 from-scratch 256-replica ensemble at output row 440 and push it
# through the FULL accumulated golden horizon (both oracles, read live), now
# band-testing ALL 7 bond.dat columns plus the cluster-size and
# receptor-oligomer distributions.  Rows < 440 keep their r4 coverage for
# the original 4 columns + cluster hists; the r5 statistics (cluster_size,
# max_complex, receptor hists) cover rows 440.. — max_complex is a RUNNING
# max, so its band test over rows 440+ still constrains the whole
# from-scratch growth history.  Writes the flagship artifact as it goes.
cd /root/repo
exec python scripts/validate_vs_reference.py kinetics \
  --ref-bond /tmp/refgolden/bond.dat /tmp/refgolden2/bond.dat \
  --ref-cluster /tmp/refgolden/cluster.log /tmp/refgolden2/cluster.log \
  --replicas 256 --align-mode lazy --sub-chunks 4 --seed 0 \
  --state-file /tmp/val_r05_state.npz --resume-state \
  --write-outputs out/flagship_r05 \
  --out VALIDATION_r05.json
