"""scipy.linprog oracle for standard-form LPs (SURVEY.md §4: oracle tests)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.optimize import linprog


def solve_oracle(problem):
    """Solve an LPProblem with scipy's HiGHS backend.

    Standard form:  min c'x  s.t.  G x >= h  ->  -G x <= -h;  A x = b.
    Returns the scipy result object (res.status: 0 optimal, 2 infeasible,
    3 unbounded).
    """
    K = problem.K
    if not sp.issparse(K):
        K = sp.csr_matrix(K)
    G = K[: problem.m_ineq]
    A = K[problem.m_ineq :]
    h = problem.q[: problem.m_ineq]
    b = problem.q[problem.m_ineq :]
    bounds = list(zip(problem.l, problem.u))
    bounds = [
        (None if np.isneginf(lo) else lo, None if np.isposinf(up) else up)
        for lo, up in bounds
    ]
    return linprog(
        problem.c,
        A_ub=-G if G.shape[0] else None,
        b_ub=-h if G.shape[0] else None,
        A_eq=A if A.shape[0] else None,
        b_eq=b if A.shape[0] else None,
        bounds=bounds,
        method="highs",
    )
