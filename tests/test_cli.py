"""CLI end-to-end tests (subprocess level, CPU backend).

The CLI is the reference-parity surface (PDLP/main.py flags + CSV schema);
these tests drive `python -m tpdlp.cli.main` as a user would.
"""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

from tpdlp import generate_feasible_lp, write_mps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-m", "tpdlp.cli.main", "--device", "cpu", *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=cwd,
    )


@pytest.fixture(scope="module")
def mps_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("cli_mps")
    for s in range(2):
        p = generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=s)
        write_mps(p, str(folder / f"inst{s}.mps"))
    (folder / "broken.mps").write_text("THIS IS NOT AN MPS FILE\n")
    return folder


def _read_results(out_dir):
    with open(os.path.join(out_dir, "solver_results.csv")) as f:
        return {row["File"]: row for row in csv.DictReader(f)}


def test_cli_sweep_reference_flags(mps_folder, tmp_path):
    out = tmp_path / "out"
    r = _run_cli(
        ["--instance_path", str(mps_folder), "--tolerance", "1e-6",
         "--precondition", "--adaptive_stepsize", "--primal_weight_update",
         "--output_path", str(out)],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rows = _read_results(str(out))
    # Reference CSV schema, solved instances, failed-load row preserved.
    assert set(rows["inst0.mps"].keys()) == {
        "File", "Objective", "Iterations (k)", "Restarts (n)",
        "KKT Passes (j)", "Time (s)", "Status", "Sense",
    }
    assert rows["inst0.mps"]["Status"] == "Solved"
    assert rows["inst1.mps"]["Status"] == "Solved"
    assert "Failed to load" in rows["broken.mps"]["Status"]
    # Objective cross-check against an in-process solve of the same file.
    from tpdlp import SolverConfig, read_mps, solve

    p0 = read_mps(str(mps_folder / "inst0.mps"))
    r0 = solve(p0, SolverConfig(tol=1e-6, scaling="ruiz", adaptive=True))
    assert float(rows["inst0.mps"]["Objective"]) == pytest.approx(
        r0.objective, abs=1e-4
    )


def test_cli_batch_solve_matches_sequential(mps_folder, tmp_path):
    out_seq = tmp_path / "seq"
    out_bat = tmp_path / "bat"
    common = ["--instance_path", str(mps_folder), "--tolerance", "1e-6",
              "--precondition"]
    r1 = _run_cli([*common, "--output_path", str(out_seq)], cwd=str(tmp_path))
    r2 = _run_cli(
        [*common, "--batch_solve", "--output_path", str(out_bat)],
        cwd=str(tmp_path),
    )
    assert r1.returncode == 0 and r2.returncode == 0, (
        r1.stderr[-1000:], r2.stderr[-1000:]
    )
    seq = _read_results(str(out_seq))
    bat = _read_results(str(out_bat))
    for name in ("inst0.mps", "inst1.mps"):
        assert bat[name]["Status"] == "Solved"
        np.testing.assert_allclose(
            float(bat[name]["Objective"]),
            float(seq[name]["Objective"]),
            rtol=1e-4,
        )
