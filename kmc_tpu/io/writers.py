"""Observability writers (components C5, C22, C23, C24 of SURVEY.md §2).

Byte-layout-compatible with the reference's flat files so downstream
analysis/validation tooling works unchanged:

* ``parameter.log`` — run-parameter header           (main.cpp:179-205)
* ``bond.dat``      — 7-column kinetics time series  (main.cpp:2247-2253)
* ``test.gro``      — GROMACS-style trajectory       (main.cpp:2258-2287)
* ``cluster.log``   — per-cluster member lists       (main.cpp:2291-2305)

Writers run host-side on states pulled from device once per output interval
(cfg.out_every steps); the hot loop never touches the filesystem.
"""

from __future__ import annotations

import os
from typing import Iterable, List

import numpy as np

from kmc_tpu.config import SimConfig
from kmc_tpu.engine.observables import Observables
from kmc_tpu.state import SimState, positions


def write_parameter_log(path: str, cfg: SimConfig) -> None:
    """Reference parameter header (appending, like main.cpp:179)."""

    def row(name, *vals):
        return f"{name:>25}" + "".join(f"{v:>15g}" if isinstance(v, float)
                                       else f"{v:>15}" for v in vals) + "\n"

    with open(path, "a") as f:
        f.write(
            f"{'box size: x y z':>25}{cfg.cell_range_x:>15g}"
            f"{cfg.cell_range_y:>7g}{cfg.cell_range_z:>7g}\n\n"
        )
        f.write(row("protein_A_tot_num", cfg.n_a))
        f.write(row("RB_A_tot_num", cfg.n_a * 4))
        f.write(row("protein_B_tot_num", cfg.n_b))
        f.write(row("RB_B_tot_num", cfg.n_b * 4) + "\n")
        f.write(row("RB_A_D", cfg.rb_a_d))
        f.write(row("RB_A_rot_D", cfg.rb_a_rot_d))
        f.write(row("RB_B_D", cfg.rb_b_d))
        f.write(row("RB_B_rot_D", cfg.rb_b_rot_d) + "\n")
        f.write(f"{'R-L interaction:':>25}\n")
        f.write(row("bond_D", cfg.bond_d))
        f.write(row("bond_rot_D", cfg.bond_rot_d))
        f.write(row("Ass_Rate", cfg.ass_rate))
        f.write(row("Diss_Rate", cfg.diss_rate) + "\n")
        f.write(f"{'Cis interaction:':>25}\n")
        f.write(row("cis_D", cfg.cis_d))
        f.write(row("cis_rot_D", cfg.cis_rot_d))
        f.write(row("mono_cis_Ass_Rate", cfg.mono_cis_ass_rate))
        f.write(row("mono_cis_Diss_Rate", cfg.mono_cis_diss_rate) + "\n")
        f.write(row("cis_Ass_Rate", cfg.cis_ass_rate))
        f.write(row("cis_Diss_Rate", cfg.cis_diss_rate) + "\n")


def append_bond_dat(path: str, obs: Observables) -> None:
    """One bond.dat row: t(ns), rl, mono_cis, cis, bond, cluster_size,
    max_complex — exact column order/widths of main.cpp:2251."""
    with open(path, "a") as f:
        f.write(
            f"{float(obs.time_ns):>15.3f}{int(obs.bond_rl):>5}"
            f"{int(obs.bond_mono_cis):>5}{int(obs.bond_cis):>10}"
            f"{int(obs.bond_num):>10}{float(obs.cluster_size):>10.3f}"
            f"{int(obs.max_complex):>10}\n"
        )


def append_gro_frame(path: str, state: SimState, cfg: SimConfig) -> None:
    """GROMACS-style frame: receptor bead centers as ALA/CA, ligand beads
    1..3 as LEU/CA, coordinates in nm (main.cpp:2258-2287)."""
    p = np.asarray(positions(state, cfg))
    na = cfg.n_a
    t = (int(state.step) - 1) * cfg.time_step
    lines: List[str] = []
    lines.append(f"Hello Gro!, t={t:.3f}")
    lines.append(str(cfg.n_a * 4 + cfg.n_b * 3))
    for i in range(na):
        for j in range(4):
            x, y, z = p[i, j, 0] / 10.0
            lines.append(
                f"{i + 1:>5}ALA{'CA':>7}{i + 1:>5}{x:>8.3f}{y:>8.3f}{z:>8.3f}"
            )
    for i in range(cfg.n_b):
        for j in range(1, 4):
            x, y, z = p[na + i, j, 0] / 10.0
            lines.append(
                f"{na + i + 1:>5}LEU{'CA':>7}{na + i + 1:>5}"
                f"{x:>8.3f}{y:>8.3f}{z:>8.3f}"
            )
    lines.append(
        f"{cfg.cell_range_x / 10:>8.3f}{cfg.cell_range_y / 10:>12.3f}"
        f"{cfg.cell_range_z / 10:>12.3f}"
    )
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


def append_hist(path: str, state: SimState, cfg: SimConfig) -> None:
    """Cluster-size distribution row: t, then ligand-seeded cluster counts by
    size 1..MAX_HIST_SIZE, then receptor-oligomer counts (observables.py).
    New in kmc_tpu — the reference only logs the mean (main.cpp:2251)."""
    from kmc_tpu.engine.clusters import cluster_labels
    from kmc_tpu.engine.observables import (
        cluster_histogram,
        receptor_oligomer_histogram,
    )

    info = cluster_labels(state, cfg)
    h1 = np.asarray(cluster_histogram(info, cfg))[1:]
    h2 = np.asarray(receptor_oligomer_histogram(info, cfg))[1:]
    t = (int(state.step) - 1) * cfg.time_step
    with open(path, "a") as f:
        f.write(
            f"{t:.3f} " + " ".join(str(int(x)) for x in h1) + " | "
            + " ".join(str(int(x)) for x in h2) + "\n"
        )


def bfs_clusters(state: SimState, cfg: SimConfig) -> List[List[int]]:
    """Host-side replication of the reference ligand-seeded BFS
    (main.cpp:505-562): one row per ligand, listing 1-based member indices
    in BFS visit order (empty for non-seed ligands)."""
    na, n = cfg.n_a, cfg.n
    a_trans = np.asarray(state.a_trans)
    a_cis = np.asarray(state.a_cis)
    b_partner = np.asarray(state.b_partner)

    def nbrs(i: int) -> Iterable[int]:
        if i < na:
            if a_trans[i] >= 0:
                yield int(a_trans[i])
            if a_cis[i] >= 0:
                yield int(a_cis[i])
        else:
            for k in range(3):
                if b_partner[i - na, k] >= 0:
                    yield int(b_partner[i - na, k])

    visited = np.zeros(n, bool)
    rows: List[List[int]] = []
    for seed in range(na, n):
        row: List[int] = []
        if not visited[seed]:
            visited[seed] = True
            queue = [seed]
            while queue:
                cur = queue.pop(0)
                row.append(cur + 1)            # reference is 1-based
                for nb in nbrs(cur):
                    if not visited[nb]:
                        visited[nb] = True
                        queue.append(nb)
        rows.append(row)
    return rows


def append_cluster_log(path: str, state: SimState, cfg: SimConfig) -> None:
    t = (int(state.step) - 1) * cfg.time_step
    rows = bfs_clusters(state, cfg)
    with open(path, "a") as f:
        f.write(f"Hello Cluster!, t={t:.3f}\n")
        for row in rows:
            f.write("".join(f"{m}  " for m in row) + "\n")


class OutputSet:
    """Bundles all periodic writers behind one callback for engine.step.run.

    With ``use_native`` (default: auto), trajectory frames are formatted by
    the C++ codec and streamed through a background-thread AsyncWriter
    (io/native.py), so output never blocks the device dispatch loop — the
    opposite of the reference's inline iostream stalls (main.cpp:2206-2305).
    """

    def __init__(self, out_dir: str, cfg: SimConfig, fresh: bool = True,
                 use_native: bool | None = None):
        self.dir = out_dir
        self.cfg = cfg
        os.makedirs(out_dir, exist_ok=True)
        self.bond = os.path.join(out_dir, "bond.dat")
        self.gro = os.path.join(out_dir, "test.gro")
        self.cluster = os.path.join(out_dir, "cluster.log")
        self.cpt = os.path.join(out_dir, "position.cpt")
        self.hist = os.path.join(out_dir, "hist.dat")
        if fresh:
            for f in (self.bond, self.gro, self.cluster, self.hist):
                open(f, "w").close()
            # only on a fresh run: a resumed run would otherwise append a
            # duplicate header block every resume (observed r4 flagship)
            write_parameter_log(os.path.join(out_dir, "parameter.log"), cfg)

        self._gro_writer = None
        if use_native is not False:
            from kmc_tpu.io import native

            if native.available():
                self._native = native
                self._gro_writer = native.AsyncWriter(self.gro)
            elif use_native:
                raise RuntimeError("native kmcio unavailable")

    def __call__(self, state: SimState, obs: Observables) -> None:
        from kmc_tpu.io.checkpoint import save_reference_cpt

        append_bond_dat(self.bond, obs)
        if self._gro_writer is not None:
            pos = np.asarray(positions(state, self.cfg))
            t = (int(state.step) - 1) * self.cfg.time_step
            frame = self._native.format_gro(
                pos, self.cfg.n_a, self.cfg.n_b, t,
                (self.cfg.cell_range_x, self.cfg.cell_range_y,
                 self.cfg.cell_range_z),
            )
            self._gro_writer.append(frame)
        else:
            append_gro_frame(self.gro, state, self.cfg)
        append_cluster_log(self.cluster, state, self.cfg)
        append_hist(self.hist, state, self.cfg)
        save_reference_cpt(self.cpt, state, self.cfg)

    def close(self) -> None:
        if self._gro_writer is not None:
            self._gro_writer.close()
            self._gro_writer = None


class EnsembleOutputSet:
    """Writers for a replica ensemble (BASELINE config 4): merged kinetics
    with error bars to ``bond_ens.dat`` (time, then mean/std/min/max per
    counter), plus the full reference-compatible file set for replica 0 so
    existing tooling keeps working."""

    COLS = ("bond_rl", "bond_mono_cis", "bond_cis", "bond_num",
            "cluster_size", "max_complex")

    def __init__(self, out_dir: str, cfg: SimConfig, fresh: bool = True):
        import jax

        self.cfg = cfg
        os.makedirs(out_dir, exist_ok=True)
        self.ens = os.path.join(out_dir, "bond_ens.dat")
        if fresh:
            with open(self.ens, "w") as f:
                f.write("# t_ns " + " ".join(
                    f"{c}_mean {c}_std {c}_min {c}_max" for c in self.COLS
                ) + "\n")
        self.rep0 = OutputSet(out_dir, cfg, fresh=fresh)
        self._take0 = jax.jit(lambda s: jax.tree.map(lambda x: x[0], s))

    def __call__(self, state, obs) -> None:
        import numpy as np

        row = [f"{float(np.asarray(obs.time_ns)[0]):.3f}"]
        for c in self.COLS:
            v = np.asarray(getattr(obs, c)).astype(np.float64)
            row += [f"{v.mean():.4f}", f"{v.std():.4f}",
                    f"{v.min():.3f}", f"{v.max():.3f}"]
        with open(self.ens, "a") as f:
            f.write(" ".join(row) + "\n")

        st0 = self._take0(state)
        obs0 = type(obs)(*[jnp_first(x) for x in obs])
        self.rep0(st0, obs0)

    def close(self) -> None:
        self.rep0.close()


def jnp_first(x):
    import numpy as np

    return np.asarray(x)[0]
