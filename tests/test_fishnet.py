"""Fishnet warm-start tests (reference: PDLP/spectral_casting.py)."""

import jax.numpy as jnp
import numpy as np

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.fishnet import _round_schedule, spectral_cast
from tpdlp.problem import to_device_arrays


def test_round_schedule_matches_reference_dynamics():
    # j=32, s=2: chop to 16 (even), 16->8 then breed back to 16 (odd), ...
    sched = _round_schedule(32, 2)
    assert sched == [
        (32, 16, False), (16, 8, True), (16, 8, False), (8, 4, True),
        (8, 4, False), (4, 2, True), (4, 2, False), (2, 1, False),
    ]


def test_spectral_cast_returns_finite_point():
    p = generate_feasible_lp(n=30, m_ineq=20, m_eq=5, seed=21)
    op, c, q, l, u = to_device_arrays(p, jnp.float64)
    x0, y0 = spectral_cast(op, c, q, l, u, p.m_ineq, k=8, seed=0)
    assert x0.shape == (p.n,) and y0.shape == (p.m,)
    assert np.isfinite(np.asarray(x0)).all()
    assert np.isfinite(np.asarray(y0)).all()


def test_warm_start_solves():
    p = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=22)
    op, c, q, l, u = to_device_arrays(p, jnp.float64)
    x0, y0 = spectral_cast(op, c, q, l, u, p.m_ineq, k=16, seed=0)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000)
    r_warm = solve(p, cfg, x0=np.asarray(x0), y0=np.asarray(y0))
    r_cold = solve(p, cfg)
    assert r_warm.status == Status.SOLVED
    np.testing.assert_allclose(r_warm.objective, r_cold.objective, rtol=1e-4)


def test_cli_fishnet_sparse_does_not_densify(tmp_path, monkeypatch, capsys):
    """--fishnet --matrix_format sparse routes through the solve-path
    operator (verdict r2 item 8): to_device_arrays (the dense staging
    helper) must never be called — a sparse-only-sized instance would OOM
    there — and the sweep must still solve via the fishnet warm start."""
    import tpdlp.cli.main as cli
    import tpdlp.problem as problem_mod
    from tpdlp import write_mps

    p = generate_feasible_lp(n=30, m_ineq=20, m_eq=5, seed=3, density=0.2)
    write_mps(p, str(tmp_path / "inst.mps"))

    def boom(*a, **k):
        raise AssertionError("fishnet densified: to_device_arrays called")

    monkeypatch.setattr(problem_mod, "to_device_arrays", boom)
    # solve()'s dense path imports the symbol by module attribute too
    # (tpdlp.solver.solve the ATTRIBUTE is the function; fetch the module).
    import importlib

    solve_mod = importlib.import_module("tpdlp.solver.solve")
    monkeypatch.setattr(solve_mod, "to_device_arrays", boom)
    out = tmp_path / "out"
    cli.main([
        "--instance_path", str(tmp_path), "--output_path", str(out),
        "--tolerance", "1e-6", "--fishnet", "--matrix_format", "sparse",
        "--device", "cpu",
    ])
    import csv

    with open(out / "solver_results.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows and all("Solved" in r["Status"] for r in rows)


def test_fishnet_value_bench_smoke(capsys):
    # The measured-value command (bench/fishnet_value.py) must run end to
    # end and report hardware-independent iteration counts for both arms.
    from tpdlp.bench import fishnet_value

    rows = fishnet_value.main(["--classes", "small", "--tol", "1e-4"])
    assert len(rows) == 3
    for r in rows:
        assert r["cold_status"] == "Solved"
        assert r["warm_status"] == "Solved"
        assert r["delta_k"] == r["cold_k"] - r["warm_k"]
