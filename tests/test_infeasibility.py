"""Infeasibility-certificate tests on planted fixtures (SURVEY.md §4:
planted-infeasible via Farkas construction)."""

import pytest

from tpdlp import SolverConfig, Status, solve
from tpdlp.io.generator import (
    generate_feasible_lp,
    generate_infeasible_lp,
    generate_unbounded_lp,
)


def _cfg(infeas_tol):
    return SolverConfig(
        tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
        infeas_tol=infeas_tol,
    )


@pytest.mark.parametrize("tol", [1e-2, 1e-4, 1e-6])
def test_primal_infeasible_detected(tol):
    p = generate_infeasible_lp(seed=3)
    r = solve(p, _cfg(tol))
    assert r.status == Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("tol", [1e-2, 1e-4])
def test_unbounded_detected_as_dual_infeasible(tol):
    # The reference's cone test cannot fire here (its c-sign conditions
    # exclude the descent-ray variable, enhancements.py:133-135); the
    # corrected recession-cone test detects it.
    p = generate_unbounded_lp(seed=1)
    r = solve(p, _cfg(tol))
    assert r.status == Status.DUAL_INFEASIBLE


def test_no_false_positive_on_feasible():
    # Normalised strict-ray certificates must not fire on a feasible LP even
    # as dx, dy -> 0 near convergence (the reference's unnormalised test
    # passes trivially there).
    p = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=5)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
        infeas_tol=1e-4, scaling="ruiz",
    )
    r = solve(p, cfg)
    assert r.status == Status.SOLVED


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_primal_infeasible_seeds(seed):
    p = generate_infeasible_lp(seed=seed)
    r = solve(p, _cfg(1e-4))
    assert r.status == Status.PRIMAL_INFEASIBLE
