"""solve(presolve=...) end-to-end round trip."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tests.oracles import solve_oracle


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_solve_with_presolve_matches_oracle(backend):
    p = generate_feasible_lp(n=30, m_ineq=18, m_eq=6, seed=17)
    p.l[4] = p.u[4] = 2.0  # plant a fixed variable
    o = solve_oracle(p)
    r = solve(
        p, SolverConfig(tol=1e-7, max_kkt=60_000, scaling="ruiz"),
        presolve=backend,
    )
    assert r.status == Status.SOLVED
    np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3, atol=1e-3)
    assert r.x.shape == (p.n,)
    assert r.x[4] == pytest.approx(2.0)


def test_solve_presolve_detects_infeasible_instantly():
    from tpdlp.problem import LPProblem

    p = LPProblem(
        c=np.array([1.0]), K=sp.csr_matrix(np.zeros((1, 1))),
        q=np.array([1.0]), m_ineq=0, l=np.array([0.0]), u=np.array([10.0]),
    )
    r = solve(p, SolverConfig(), presolve="cpp")
    assert r.status == Status.PRIMAL_INFEASIBLE
    assert r.kkt_passes == 0


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_dual_postsolve_is_dual_feasible(backend):
    """solve(presolve=...) now returns duals mapped through the postsolve
    stack (beyond the reference, whose PaPILO round trip is primal-only —
    papilo_wrapper.cpp:37-45).  The recovered (x, y) must satisfy the
    original problem's KKT conditions."""
    from tests.oracles import dual_violation

    p = generate_feasible_lp(n=28, m_ineq=16, m_eq=7, seed=23)
    # Plant reducible structure: a fixed variable, a singleton row, and a
    # doubleton equality (x_new appears twice: once in a 2-nnz eq row with
    # x0, once in an inequality row).
    p.l[3] = p.u[3] = 1.5
    K = p.K.toarray()
    single = np.zeros((1, p.n)); single[0, 7] = 1.0
    K = np.vstack([single, K])
    q = np.concatenate([[p.l[7] - 1.0], p.q])
    col = np.zeros((K.shape[0], 1)); col[1, 0] = 0.5
    dbl = np.zeros((1, p.n + 1)); dbl[0, 0] = 1.0; dbl[0, -1] = 2.0
    p.K = sp.csr_matrix(np.vstack([np.hstack([K, col]), dbl]))
    p.q = np.concatenate([q, [0.3]])
    p.c = np.concatenate([p.c, [0.1]])
    p.l = np.concatenate([p.l, [-50.0]])
    p.u = np.concatenate([p.u, [50.0]])
    p.m_ineq += 1

    r = solve(
        p,
        SolverConfig(tol=1e-8, max_kkt=120_000, scaling="ruiz",
                     abs_gap_termination=True),
        presolve=backend,
    )
    assert r.status == Status.SOLVED
    o = solve_oracle(p)
    np.testing.assert_allclose(r.objective, o.fun, rtol=1e-5, atol=1e-5)
    assert r.y.shape == (p.m,)
    assert dual_violation(p, r.x, r.y) < 1e-4
