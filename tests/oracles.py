"""scipy.linprog oracle for standard-form LPs (SURVEY.md §4: oracle tests)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.optimize import linprog


def solve_oracle(problem):
    """Solve an LPProblem with scipy's HiGHS backend.

    Standard form:  min c'x  s.t.  G x >= h  ->  -G x <= -h;  A x = b.
    Returns the scipy result object (res.status: 0 optimal, 2 infeasible,
    3 unbounded).  res.fun includes the problem's obj_offset (the MPS
    objective-row constant), matching SolveResult.objective's convention.
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
    res = linprog(
        problem.c,
        A_ub=-G if G.shape[0] else None,
        b_ub=-h if G.shape[0] else None,
        A_eq=A if A.shape[0] else None,
        b_eq=b if A.shape[0] else None,
        bounds=bounds,
        method="highs",
    )
    offset = getattr(problem, "obj_offset", 0.0)
    if res.status == 0 and offset:
        res.fun = res.fun + offset
    return res


def dual_violation(problem, x, y):
    """Max KKT violation of a primal-dual pair on the ORIGINAL problem.

    Checks (standard form min c'x s.t. Gx >= h, Ax = b, l <= x <= u):
      - inequality duals nonnegative,
      - dual residual ||(c - K'y) - lambda||_inf with lambda the projection
        of the reduced cost onto the normal cone of [l, u]
        (reference PDLP/helpers.py:3-39),
      - strong duality |c'x - (q'y + l'max(lam,0) + u'min(lam,0))|.
    Returns the max of the three (relative where natural).
    """
    K = problem.K
    if not sp.issparse(K):
        K = sp.csr_matrix(K)
    y = np.asarray(y, float)
    x = np.asarray(x, float)
    grad = problem.c - K.T @ y
    neg = np.isneginf(problem.l)
    pos = np.isposinf(problem.u)
    lam = np.where(neg & ~pos, np.minimum(grad, 0.0), grad)
    lam = np.where(pos & ~neg, np.maximum(grad, 0.0), lam)
    lam = np.where(neg & pos, 0.0, lam)
    dual_res = np.max(np.abs(grad - lam)) if lam.size else 0.0
    y_neg = max(0.0, float(np.max(-y[: problem.m_ineq], initial=0.0)))
    l_fin = np.where(np.isfinite(problem.l), problem.l, 0.0)
    u_fin = np.where(np.isfinite(problem.u), problem.u, 0.0)
    adjusted = float(
        problem.q @ y
        + l_fin @ np.maximum(lam, 0.0)
        + u_fin @ np.minimum(lam, 0.0)
    )
    prim = float(problem.c @ x)
    gap = abs(prim - adjusted) / (1.0 + abs(prim) + abs(adjusted))
    return max(dual_res / (1.0 + np.max(np.abs(problem.c))), y_neg, gap)
