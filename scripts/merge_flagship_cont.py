#!/usr/bin/env python
"""Append the continuation run's replica-0 outputs (out/flagship_r05_cont,
rows 572+) onto the committed flagship file set (out/flagship_r05, rows
1-571), producing one continuous trajectory file set on a single time
axis.  The continuation's replica 0 starts from the flagship replica-0
state itself (broadcast anchor), so the appended rows are a legitimate
continuation of the same physical trajectory under fresh RNG streams.

Checks before touching anything: the continuation's first bond.dat time
must be exactly one output interval past the flagship's last row, and
every appended file must have self-consistent frame counts.
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kmc_tpu.config import SimConfig

BASE = "out/flagship_r05"
CONT = "out/flagship_r05_cont"
cfg = SimConfig()
natoms = cfg.n_a * 4 + cfg.n_b * 3
OUT_DT = cfg.out_every * cfg.time_step


def rows_of(path):
    with open(path) as f:
        return f.readlines()


base_bond = rows_of(f"{BASE}/bond.dat")
cont_bond = rows_of(f"{CONT}/bond.dat")
t_last = float(base_bond[-1].split()[0])
t_first = float(cont_bond[0].split()[0])
assert abs((t_first - t_last) - OUT_DT) < 1e-6, (t_last, t_first, OUT_DT)
n = len(cont_bond)

# every per-row file in the continuation dir must agree on the row count
cont_hist = rows_of(f"{CONT}/hist.dat")
cont_clu = rows_of(f"{CONT}/cluster.log")
cont_gro = rows_of(f"{CONT}/test.gro")
cont_ens = rows_of(f"{CONT}/bond_ens.dat")
assert len(cont_hist) == n, (len(cont_hist), n)
assert len(cont_clu) == n * (cfg.n_b + 1), (len(cont_clu), n)
assert len(cont_gro) == n * (natoms + 3), (len(cont_gro), n)
assert len(cont_ens) == n + 1 and cont_ens[0].startswith("#")

with open(f"{BASE}/bond.dat", "a") as f:
    f.writelines(cont_bond)
with open(f"{BASE}/hist.dat", "a") as f:
    f.writelines(cont_hist)
with open(f"{BASE}/cluster.log", "a") as f:
    f.writelines(cont_clu)
with open(f"{BASE}/test.gro", "a") as f:
    f.writelines(cont_gro)
with open(f"{BASE}/bond_ens.dat", "a") as f:
    f.write("# re-anchored continuation (broadcast of replica 0's state "
            "at the previous row; seed 21) begins here\n")
    f.writelines(cont_ens[1:])
shutil.copy(f"{CONT}/position.cpt", f"{BASE}/position.cpt")
print(f"appended {n} continuation rows: flagship now "
      f"{len(base_bond) + n} outputs, t = {float(cont_bond[-1].split()[0]):.0f} ns")
