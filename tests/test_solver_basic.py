"""End-to-end solver tests on synthetic LPs against the scipy/HiGHS oracle."""

import numpy as np
import pytest

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tests.oracles import solve_oracle


def _check_against_oracle(problem, result, tol_obj=1e-3):
    oracle = solve_oracle(problem)
    assert oracle.status == 0, "oracle failed on a supposedly feasible LP"
    assert result.status == Status.SOLVED, (
        f"status={result.status_string} rp={result.primal_res:.2e} "
        f"rd={result.dual_res:.2e} gap={result.gap:.2e}"
    )
    assert result.objective == pytest.approx(
        oracle.fun, rel=tol_obj, abs=tol_obj
    )


def test_tiny_lp_fixed_step():
    problem = generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=1)
    cfg = SolverConfig(tol=1e-6, max_kkt=40_000)
    result = solve(problem, cfg)
    _check_against_oracle(problem, result)


def test_medium_lp_all_features():
    problem = generate_feasible_lp(n=60, m_ineq=40, m_eq=10, seed=2)
    cfg = SolverConfig(
        tol=1e-6,
        max_kkt=60_000,
        scaling="ruiz",
        adaptive=True,
        primal_weight_update=True,
    )
    result = solve(problem, cfg)
    _check_against_oracle(problem, result)


def test_equality_only_lp():
    problem = generate_feasible_lp(n=30, m_ineq=0, m_eq=12, seed=3)
    cfg = SolverConfig(tol=1e-6, max_kkt=40_000, scaling="ruiz")
    result = solve(problem, cfg)
    _check_against_oracle(problem, result)


def test_inequality_only_lp():
    problem = generate_feasible_lp(n=30, m_ineq=20, m_eq=0, seed=4)
    cfg = SolverConfig(tol=1e-6, max_kkt=40_000)
    result = solve(problem, cfg)
    _check_against_oracle(problem, result)


def test_adaptive_linesearch_rule():
    problem = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=5)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, adaptive=True, adaptive_rule="linesearch",
        scaling="ruiz",
    )
    result = solve(problem, cfg)
    _check_against_oracle(problem, result)


def test_high_accuracy_fp64():
    problem = generate_feasible_lp(n=40, m_ineq=30, m_eq=5, seed=6)
    cfg = SolverConfig(
        tol=1e-8, max_kkt=100_000, scaling="ruiz", adaptive=True,
        primal_weight_update=True,
    )
    result = solve(problem, cfg, dtype=np.float64)
    _check_against_oracle(problem, result, tol_obj=1e-6)
    assert result.primal_res <= 1e-8 * (1 + np.linalg.norm(problem.q))


def test_kkt_budget_respected():
    problem = generate_feasible_lp(n=50, m_ineq=40, m_eq=10, seed=7)
    cfg = SolverConfig(tol=1e-12, max_kkt=500)
    result = solve(problem, cfg)
    # Budget exhausted: may still be declared solved by the final check.
    # The blocked loop checks the budget once per restart cycle, so j may
    # overrun max_kkt by up to one cycle (restart_period iterations + the
    # boundary check's 5 ledger passes) plus the final evaluation's 2.
    assert result.kkt_passes <= 500 + cfg.restart_period + 5 + 2


def test_reporting_fields_consistent():
    problem = generate_feasible_lp(n=20, m_ineq=10, m_eq=5, seed=8)
    result = solve(problem, SolverConfig(tol=1e-6, max_kkt=40_000))
    row = result.csv_row(problem.name)
    assert set(row) == {
        "File", "Objective", "Iterations (k)", "Restarts (n)",
        "KKT Passes (j)", "Time (s)", "Status", "Sense",
    }
    assert result.iterations > 0 and result.kkt_passes >= result.iterations


def test_precision_escalation_two_stage():
    """fp32 stage to escalation_tol, fp64 warm-started tail to tol; counters
    span both stages (the accelerator default for tol < 1e-6)."""
    import jax.numpy as jnp

    from tests.oracles import solve_oracle
    from tpdlp.solver.solve import _solve_escalated

    problem = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=7)
    cfg = SolverConfig(
        tol=1e-8, scaling="ruiz", adaptive=True, primal_weight_update=True
    )
    r = _solve_escalated(
        problem, cfg, seed=0, time_used=0.0, mesh=None,
        matrix_format="dense", checkpoint_path=None, log_history=False,
    )
    assert r.status == Status.SOLVED
    oracle = solve_oracle(problem)
    assert r.objective == pytest.approx(oracle.fun, abs=1e-6)
    # The fp32 stage alone cannot reach 1e-8; kkt_passes must include both
    # stages (strictly more than a pure fp64 warm tail would report).
    s1 = solve(
        problem, cfg.replace(tol=cfg.escalation_tol), dtype=jnp.float32
    )
    assert r.kkt_passes > s1.kkt_passes
    assert r.x.dtype == np.float64


def test_escalation_budget_exhausted_reports_kkt_limit():
    """If the fp32 stage consumes the whole KKT budget, the requested
    (tighter) tolerance was never certified: status must be KKT_LIMIT,
    not the coarse stage's SOLVED."""
    import jax.numpy as jnp

    from tpdlp.solver.solve import _solve_escalated

    problem = generate_feasible_lp(n=30, m_ineq=18, m_eq=6, seed=3)
    # 'inherit' pins both stages to this exact configuration so the
    # budget computed from s1 matches stage 1 pass-for-pass.
    cfg = SolverConfig(tol=1e-8, scaling="ruiz", escalation_scheme="inherit")
    s1 = solve(problem, cfg.replace(tol=cfg.escalation_tol), dtype=jnp.float32)
    assert s1.status == Status.SOLVED
    r = _solve_escalated(
        problem, cfg.replace(max_kkt=s1.kkt_passes), seed=0, time_used=0.0,
        mesh=None, matrix_format="dense", checkpoint_path=None,
        log_history=False,
    )
    assert r.status == Status.KKT_LIMIT


@pytest.mark.parametrize("seed", [1, 4, 9])
def test_halpern_scheme_solves_and_accelerates(seed):
    """The reflected-Halpern scheme (cuPDLP+ style) reaches the same
    objective as vanilla restarted PDHG; across seeds it should not need
    more iterations (typically ~2x fewer)."""
    from tests.oracles import solve_oracle

    problem = generate_feasible_lp(n=60, m_ineq=35, m_eq=12, seed=seed)
    base = dict(tol=1e-7, scaling="ruiz", primal_weight_update=True)
    rv = solve(problem, SolverConfig(step_scheme="vanilla", **base))
    rh = solve(problem, SolverConfig(step_scheme="halpern", **base))
    oracle = solve_oracle(problem)
    assert rh.status == Status.SOLVED, rh.status_string
    assert rh.objective == pytest.approx(oracle.fun, abs=1e-4)
    assert rv.status == Status.SOLVED
    # Feasibility of the reported point (the carried z is unprojected;
    # the result must come from the feasible PDHG output).
    assert np.all(rh.x >= problem.l - 1e-7)
    assert np.all(rh.x <= problem.u + 1e-7)
    assert rh.iterations <= rv.iterations * 1.2  # no blow-up; usually less


def test_halpern_infeasible_certificates():
    from tpdlp import generate_infeasible_lp

    pi = generate_infeasible_lp(seed=2)
    r = solve(
        pi,
        SolverConfig(
            tol=1e-6, step_scheme="halpern", infeasibility_detect=True
        ),
    )
    assert r.status in (Status.PRIMAL_INFEASIBLE, Status.DUAL_INFEASIBLE)
