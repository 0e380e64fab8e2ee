"""Configuration system (component C1 of SURVEY.md §2).

The reference hard-codes every physical and runtime parameter as file-scope
globals and ``#define`` constants (main.cpp:39-99); changing a parameter
requires recompiling.  Here the same parameter set is a frozen, hashable
dataclass: instances are static arguments to ``jax.jit``, so every field is
a compile-time constant on TPU — the idiomatic equivalent of ``#define``.

Parameter names follow the reference's ``parameter.log`` keys
(main.cpp:179-205) so logs stay comparable between the two codebases.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Any


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """All physics + runtime constants of the particle engine.

    Defaults reproduce the reference workload (main.cpp:39-99): 150 membrane
    receptors (protein A) + 50 ligand trimers (protein B) in a
    5773 x 5773 x 1000 Angstrom box, dt = 10 ns.
    """

    # ---- run control (main.cpp:39-40) ----
    simu_step: int = 20_000_000
    time_step: float = 10.0            # ns
    out_every: int = 5000              # checkpoint/time-series cadence (main.cpp:2206)

    # ---- box (main.cpp:43-45); periodic in x,y, z-reflecting for ligands ----
    cell_range_x: float = 5773.0
    cell_range_y: float = 5773.0
    cell_range_z: float = 1000.0

    # ---- molecule counts (main.cpp:47-69) ----
    n_a: int = 150                     # receptors (protein A)
    n_b: int = 50                      # ligand trimers (protein B)

    # ---- geometry (main.cpp:71-78) ----
    rb_a_radius: float = 20.0          # receptor bead radius (Angstrom)
    rb_b_radius: float = 30.0          # ligand bead radius

    # ---- diffusion coefficients (main.cpp:73-89) ----
    rb_a_d: float = 1.0                # A^2/ns, free receptor translation
    rb_a_rot_d: float = 0.0174         # rad^2/ns, free receptor rotation
    rb_b_d: float = 7.2614             # free ligand translation
    rb_b_rot_d: float = 0.0061209      # free ligand rotation
    cis_d: float = 0.5                 # lone cis receptor pair translation
    cis_rot_d: float = 0.005
    bond_d: float = 0.5                # 1-ligand complex translation (main.cpp:88,984)
    bond_rot_d: float = 0.005

    # ---- reaction rates, per ns (main.cpp:80-91) ----
    ass_rate: float = 0.04             # trans (receptor-ligand) association
    diss_rate: float = 3.48e-13        # trans dissociation
    mono_cis_ass_rate: float = 4.7e-5  # cis association, both receptors free
    mono_cis_diss_rate: float = 1.12e-13
    cis_ass_rate: float = 9.6e-4       # cis association, >=1 receptor bound
    cis_diss_rate: float = 1.12e-13

    # ---- geometric gates (main.cpp:93-99) ----
    bond_dist_cutoff: float = 18.0     # trans site-site distance gate
    bond_thetapd_cutoff: float = 45.0  # |theta_pd| gate, degrees (main.cpp:1915)
    bond_thetaot_cutoff: float = 90.0  # |theta_ot - 180| gate
    cis_dist_cutoff: float = 15.0
    cis_thetaot_cutoff: float = 10.0

    # ---- TPU-engine knobs (new; no reference equivalent) ----
    label_closure_iters: int = 8       # adjacency-matrix squarings for cluster
    #   labels: coverage = 2^iters hops >= n guarantees exact components
    #   (resolves component diameters up to 2^6 — far beyond physical complexes)
    align_depth: int = 8               # max BFS depth idealized per step
    #   (snap chains longer than this finish over subsequent steps; the
    #   mobility freeze keeps real complexes well inside this bound)
    match_rounds: int = 2              # mutual-argmax rounds in reaction matching
    fused_align: bool = True           # run the idealize core as one fused
    #   Pallas kernel (ops/pallas_align.py); False = pure-XLA path.  Both are
    #   numerically equivalent within <=1e-4 A (tests/test_pallas_align.py).
    #   Measured on one v5e chip, 256 replicas: 38.5 ms/step fused vs 52.8
    #   ms/step XLA (scripts/bench_align_tpu.py, 2026-08-20).
    sin_weighted_theta: bool = False   # reference quirk #3: ligand 3D direction
    #   uses theta = U*pi (pole-oversampled, main.cpp:910). False replicates the
    #   reference; True samples cos(theta) uniformly (physically isotropic).
    sweep_collisions: bool = True      # collision resolution emulates the
    #   reference's Gauss-Seidel sweep (main.cpp:577-1872) via random cluster
    #   priorities: later movers see earlier movers' NEW placements, earlier
    #   movers see later movers' OLD placements, + a monotone cleanup loop
    #   guaranteeing the no-overlap invariant.  False = the round-1 symmetric
    #   rule (reject on overlap with ANY placement, old or new, of any other
    #   cluster), which double-counts mover-mover collisions and accepts
    #   strictly fewer moves.  Controlled same-snapshot continuations of the
    #   reference give saturated-state MSD our/ref = 1.08 (sweep) vs 1.03
    #   (symmetric) — both within estimator noise at reference density
    #   (VALIDATION_r02_msd.json); the sweep rule is default for fidelity of
    #   the acceptance semantics, not for a measured kinetics difference.
    sweep_exact_cleanup: bool = False  # True: certify the no-overlap
    #   invariant with a while_loop to fixpoint (exact).  False (default):
    #   3 unrolled cleanup rounds — revert chains deeper than 3
    #   (astronomically rare; each link needs a distinct same-step
    #   geometric conflict) can leave a transient overlap that the
    #   collision rule then self-heals (moves apart accepted, moves
    #   together rejected).  Default is unrolled because a dynamic loop in
    #   the hot scan costs far more than its body (the diffuse stage
    #   profiled at ~11 ms of a 34.5 ms step with the while_loop); exact
    #   mode remains for certification runs.

    # ------------------------------------------------------------------
    @property
    def n(self) -> int:
        """Total molecules (A then B)."""
        return self.n_a + self.n_b

    @property
    def plane_z(self) -> float:
        """z of the receptor interaction bead (bead index 2; reference bead 3
        at z = (3*2-2)*RB_A_radius, main.cpp:301) — the ligand lay-down plane."""
        return 4.0 * self.rb_a_radius

    @property
    def p_trans_ass(self) -> float:
        return self.ass_rate * self.time_step

    @property
    def p_trans_diss(self) -> float:
        return self.diss_rate * self.time_step

    @property
    def p_mono_cis_ass(self) -> float:
        return self.mono_cis_ass_rate * self.time_step

    @property
    def p_mono_cis_diss(self) -> float:
        return self.mono_cis_diss_rate * self.time_step

    @property
    def p_cis_ass(self) -> float:
        return self.cis_ass_rate * self.time_step

    @property
    def p_cis_diss(self) -> float:
        return self.cis_diss_rate * self.time_step

    @property
    def trimer_arm(self) -> float:
        """Distance from ligand virtual center to each bead center
        (main.cpp:395: RB_B_radius * 2/sqrt(3))."""
        return self.rb_b_radius * 2.0 / math.sqrt(3.0)

    # ------------------------------------------------------------------
    def replace(self, **kw: Any) -> "SimConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SimConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    @classmethod
    def from_json(cls, path: str) -> "SimConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)


@dataclasses.dataclass(frozen=True)
class LatticeConfig:
    """Lattice diffusion-reaction engine configuration (BASELINE configs 2/5).

    A 2D occupancy-grid lattice gas with on-site association/dissociation —
    the scalable analogue of the particle engine, designed for Pallas kernels
    and ('x','y') domain decomposition with halo exchange.
    """

    height: int = 512
    width: int = 512
    n_species: int = 3                 # 0 empty, 1 monomer, 2 dimer (extendable)
    hop_prob: float = 0.25             # per-step hop attempt probability
    ass_prob: float = 0.1              # neighbor monomer+monomer -> dimer
    diss_prob: float = 0.001           # dimer -> 2 monomers
    density: float = 0.04              # initial monomer fill fraction

    def replace(self, **kw: Any) -> "LatticeConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "LatticeConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


# Reference-default singleton used across tests/benches.
DEFAULT = SimConfig()
