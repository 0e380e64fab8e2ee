"""CLI driver tests (single and ensemble modes) on the CPU platform."""

import os

import numpy as np
import pytest

from kmc_tpu import cli


def _args(tmp_path, *extra):
    return [
        "--out", str(tmp_path), "--seed", "1", "--quiet",
        "--set", "n_a=12", "--set", "n_b=4",
        "--set", "cell_range_x=1500", "--set", "cell_range_y=1500",
        "--set", "cell_range_z=500", "--set", "out_every=20",
        *extra,
    ]


def test_cli_single_run_and_resume(tmp_path):
    assert cli.main(["--steps", "40", *_args(tmp_path)]) == 0
    bond = open(os.path.join(tmp_path, "bond.dat")).read().splitlines()
    assert len(bond) == 2
    assert os.path.exists(os.path.join(tmp_path, "checkpoint.npz"))

    # resume: continues the time axis
    assert cli.main(["--steps", "20", *_args(tmp_path)]) == 0
    bond = open(os.path.join(tmp_path, "bond.dat")).read().splitlines()
    assert len(bond) == 3
    times = [float(l.split()[0]) for l in bond]
    assert times == [200.0, 400.0, 600.0]


def test_cli_ensemble_mode(tmp_path):
    assert cli.main(["--steps", "20", "--replicas", "8",
                     *_args(tmp_path)]) == 0
    ens = open(os.path.join(tmp_path, "bond_ens.dat")).read().splitlines()
    assert ens[0].startswith("# t_ns")
    row = ens[1].split()
    assert float(row[0]) == 200.0
    assert len(row) == 1 + 6 * 4
    # replica-0 reference-format outputs exist too
    assert os.path.exists(os.path.join(tmp_path, "bond.dat"))
    assert os.path.exists(os.path.join(tmp_path, "test.gro"))


def test_cli_lattice_mode(tmp_path):
    base = ["--engine", "lattice", "--out", str(tmp_path),
            "--seed", "1", "--quiet", "--out-every", "100",
            "--set", "height=32", "--set", "width=32", "--set", "density=0.1"]
    assert cli.main(base + ["--steps", "200"]) == 0
    rows = open(os.path.join(tmp_path, "lattice.dat")).read().splitlines()
    assert len(rows) == 2
    n0 = int(rows[0].split()[1])
    assert int(rows[1].split()[1]) == n0          # mass conserved
    # resume continues
    assert cli.main(base + ["--steps", "100"]) == 0
    rows = open(os.path.join(tmp_path, "lattice.dat")).read().splitlines()
    assert len(rows) == 3 and rows[2].startswith("300 ")


def test_cli_bad_value_message(tmp_path, capsys):
    with pytest.raises(SystemExit) as e:
        cli.main(["--steps", "1", "--out", str(tmp_path), "--set", "n_a=abc"])
    assert "invalid value for n_a" in str(e.value)


def test_cli_unknown_key(tmp_path):
    with pytest.raises(SystemExit) as e:
        cli.main(["--steps", "1", "--out", str(tmp_path), "--set", "nope=1"])
    assert "unknown config key" in str(e.value)
