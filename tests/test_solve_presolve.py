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
