"""Realistic fixed-format MPS corpus: parse, solve, presolve, CLI sweep.

The corpus (tpdlp/bench/instances/*.mps, authored by make_corpus.py)
carries the real-world parser surface the synthetic round trip never
touches — fixed-format fields, comments, mixed L/G/E senses, RANGES,
every BOUNDS type, objective-row RHS constants.  Reference corpus analog:
the MPS folder sweeps of PDLP/main.py:83 and the infeasible battery of
experiments/InfeasibilityDetection3.py:937.
"""

import csv
import glob
import gzip
import os
import subprocess
import sys

import numpy as np
import pytest

from tpdlp import SolverConfig, Status, solve
from tpdlp.io.mps import read_mps
from tests.oracles import dual_violation, solve_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INSTANCES = os.path.join(REPO, "tpdlp", "bench", "instances")
FEASIBLE = sorted(
    f for f in glob.glob(os.path.join(INSTANCES, "*.mps"))
    if not os.path.basename(f).startswith(("infeas", "unbnd"))
)
TERMINAL = sorted(
    f for f in glob.glob(os.path.join(INSTANCES, "*.mps"))
    if os.path.basename(f).startswith(("infeas", "unbnd"))
)


def test_corpus_present():
    assert len(FEASIBLE) >= 5
    assert len(TERMINAL) >= 2


@pytest.mark.parametrize(
    "path", FEASIBLE, ids=[os.path.basename(f) for f in FEASIBLE]
)
def test_corpus_solves_to_oracle(path):
    p = read_mps(path)
    o = solve_oracle(p)
    assert o.status == 0
    r = solve(
        p,
        SolverConfig(tol=1e-7, max_kkt=200_000, scaling="ruiz",
                     adaptive=True, abs_gap_termination=True),
    )
    assert r.status == Status.SOLVED, (path, r.status_string)
    scale = 1.0 + abs(o.fun)
    assert abs(r.objective - o.fun) / scale < 1e-5
    assert dual_violation(p, r.x, r.y) < 1e-4


@pytest.mark.parametrize("backend", ["python", "cpp"])
@pytest.mark.parametrize(
    "path", FEASIBLE, ids=[os.path.basename(f) for f in FEASIBLE]
)
def test_corpus_presolve_round_trip(path, backend):
    p = read_mps(path)
    o = solve_oracle(p)
    r = solve(
        p,
        SolverConfig(tol=1e-7, max_kkt=200_000, scaling="ruiz",
                     abs_gap_termination=True),
        presolve=backend,
    )
    assert r.status == Status.SOLVED, (path, r.status_string)
    scale = 1.0 + abs(o.fun)
    assert abs(r.objective - o.fun) / scale < 1e-5
    assert dual_violation(p, r.x, r.y) < 1e-4


def test_objective_constant_parsed():
    # prod06 carries an RHS entry on the objective row (fixed cost 850).
    p = read_mps(os.path.join(INSTANCES, "prod06.mps"))
    assert p.obj_offset == pytest.approx(850.0)


def test_objective_constant_reported_absolutely():
    """SolveResult.objective must include prod06's 850 fixed cost — an
    ABSOLUTE objective check, not oracle-relative (verdict r2 item 4)."""
    p = read_mps(os.path.join(INSTANCES, "prod06.mps"))
    r = solve(
        p,
        SolverConfig(tol=1e-7, max_kkt=200_000, scaling="ruiz",
                     abs_gap_termination=True),
    )
    assert r.status == Status.SOLVED
    raw_cx = float(np.dot(p.c, r.x))
    assert r.objective == pytest.approx(raw_cx + 850.0)
    assert r.obj_offset == pytest.approx(850.0)
    # Through presolve too (the offset must survive the round trip).
    rp = solve(
        p,
        SolverConfig(tol=1e-7, max_kkt=200_000, scaling="ruiz",
                     abs_gap_termination=True),
        presolve="cpp",
    )
    assert rp.objective == pytest.approx(r.objective, rel=1e-5)


def test_objsense_max_reported_in_original_sense(tmp_path):
    # A MAX input is negated into min form internally; the CSV/reporting
    # surface must give the user back the maximized value.
    f = tmp_path / "mx.mps"
    f.write_text(
        "NAME MX\nOBJSENSE\n MAX\nROWS\n N OBJ\n L R1\n"
        "COLUMNS\n X OBJ 2.0 R1 1.0\nRHS\n RHS R1 3.0\n"
        " RHS OBJ -5.0\nENDATA\n"
    )
    p = read_mps(f)
    assert p.objsense == "MAX"
    r = solve(p, SolverConfig(tol=1e-7, max_kkt=20_000))
    assert r.status == Status.SOLVED
    # max 2x + 5 s.t. x <= 3, x >= 0  ->  x = 3, objective 11.
    assert r.objective_original_sense == pytest.approx(11.0, abs=1e-4)
    assert r.csv_row("mx.mps")["Sense"] == "MAX"
    assert float(r.csv_row("mx.mps")["Objective"]) == pytest.approx(
        11.0, abs=1e-4
    )


def test_infeasible_instance_detected():
    p = read_mps(os.path.join(INSTANCES, "infeas01.mps"))
    r = solve(
        p,
        SolverConfig(tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
                     scaling="ruiz"),
    )
    assert r.status == Status.PRIMAL_INFEASIBLE


def test_infeasible_instance_detected_through_presolve():
    # Aggregate (demand > supply) infeasibility is not row-local, so the
    # presolver passes it through; the ray detector must still certify it
    # on the reduced problem and the status must survive the round trip.
    p = read_mps(os.path.join(INSTANCES, "infeas01.mps"))
    r = solve(
        p,
        SolverConfig(tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
                     scaling="ruiz"),
        presolve="cpp",
    )
    assert r.status == Status.PRIMAL_INFEASIBLE


def test_unbounded_instance_detected():
    p = read_mps(os.path.join(INSTANCES, "unbnd01.mps"))
    r = solve(
        p,
        SolverConfig(tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
                     scaling="ruiz"),
    )
    assert r.status == Status.DUAL_INFEASIBLE


def test_cli_sweep_over_corpus(tmp_path):
    """The reference-parity folder sweep over the real-format corpus."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-m", "tpdlp.cli.main", "--device", "cpu",
         "--instance_path", INSTANCES, "--tolerance", "1e-6",
         "--precondition", "--adaptive_stepsize",
         "--infeasibility_detect",
         "--output_path", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    csv_path = os.path.join(str(tmp_path), "solver_results.csv")
    with open(csv_path) as f:
        rows = {r["File"]: r for r in csv.DictReader(f)}
    names = {os.path.splitext(os.path.basename(f))[0] for f in FEASIBLE}
    for name in names:
        key = next(k for k in rows if name in k)
        assert "Solved" in rows[key]["Status"], rows[key]
    infeas_key = next(k for k in rows if "infeas01" in k)
    assert "INFEASIBLE" in rows[infeas_key]["Status"].upper(), (
        rows[infeas_key]
    )


# ---- netlib fetcher (network-free tests via file:// mirrors) ----


def test_netlib_fetch_from_local_mirror(tmp_path):
    from tpdlp.io import netlib

    # Serve a corpus file through a file:// mirror template, gzipped to
    # exercise the decompression path.
    src = os.path.join(INSTANCES, "blend04.mps")
    mirror_dir = tmp_path / "mirror"
    mirror_dir.mkdir()
    with open(src, "rb") as f:
        (mirror_dir / "blend04.mps.gz").write_bytes(gzip.compress(f.read()))
    mirrors = [f"file://{mirror_dir}/{{name}}.mps.gz"]
    cache = tmp_path / "cache"
    path = netlib.fetch("blend04", cache_dir=str(cache), mirrors=mirrors)
    assert os.path.exists(path)
    p = netlib.load("blend04", cache_dir=str(cache), mirrors=mirrors)
    assert p.n == 12 and p.m == 16
    # Second fetch must hit the cache (remove the mirror to prove it).
    (mirror_dir / "blend04.mps.gz").unlink()
    assert netlib.fetch("blend04", cache_dir=str(cache),
                        mirrors=mirrors) == path


def test_netlib_unavailable_error_is_clear(tmp_path):
    from tpdlp.io import netlib

    # sc50a is not vendored, so the offline error path still triggers.
    with pytest.raises(netlib.NetlibUnavailable, match="sc50a"):
        netlib.fetch(
            "sc50a", cache_dir=str(tmp_path),
            mirrors=[f"file://{tmp_path}/missing/{{name}}.mps"],
        )


def test_netlib_rejects_non_mps_payload(tmp_path):
    from tpdlp.io import netlib

    mirror_dir = tmp_path / "mirror"
    mirror_dir.mkdir()
    (mirror_dir / "junk.mps").write_text("<html>not found</html>\n")
    with pytest.raises(netlib.NetlibUnavailable, match="does not look"):
        netlib.fetch(
            "junk", cache_dir=str(tmp_path / "cache"),
            mirrors=[f"file://{mirror_dir}/{{name}}.mps"],
        )


def test_presolve_stats_over_corpus():
    from tpdlp.bench.presolve_stats import run_stats

    rows = run_stats(backends=("python", "cpp"))
    assert len(rows) >= 10  # 5 feasible instances x 2 engines
    by_key = {}
    for r in rows:
        by_key.setdefault(r["instance"], {})[r["backend"]] = r
    for name, engines in by_key.items():
        # Engines agree on every reduction statistic.
        a, b = engines["python"], engines["cpp"]
        for k in ("status", "rows_removed_pct", "cols_removed_pct",
                  "nnz_removed_pct", "passes"):
            assert a[k] == b[k], (name, k, a[k], b[k])
