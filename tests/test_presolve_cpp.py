"""C++ presolve core parity tests against the Python engine."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import Status, generate_feasible_lp
from tpdlp.presolve import postsolve, presolve


def _compare(p):
    rp = presolve(p, backend="python")
    rc = presolve(p, backend="cpp")
    assert rc.status == rp.status
    assert rc.rows_removed == rp.rows_removed
    assert rc.cols_removed == rp.cols_removed
    np.testing.assert_allclose(
        rc.data.obj_offset, rp.data.obj_offset, rtol=1e-12
    )
    np.testing.assert_array_equal(rc.data.col_map, rp.data.col_map)
    order_c = np.argsort(rc.data.fixed_idx)
    order_p = np.argsort(rp.data.fixed_idx)
    np.testing.assert_array_equal(
        rc.data.fixed_idx[order_c], rp.data.fixed_idx[order_p]
    )
    np.testing.assert_allclose(
        rc.data.fixed_val[order_c], rp.data.fixed_val[order_p], rtol=1e-12
    )
    if rp.status == Status.RUNNING:
        np.testing.assert_allclose(
            rc.problem.K.toarray(), rp.problem.K.toarray(), rtol=1e-12
        )
        np.testing.assert_allclose(rc.problem.q, rp.problem.q, rtol=1e-12)
        np.testing.assert_allclose(rc.problem.c, rp.problem.c, rtol=1e-12)
        np.testing.assert_allclose(rc.problem.l, rp.problem.l, rtol=1e-12)
        np.testing.assert_allclose(rc.problem.u, rp.problem.u, rtol=1e-12)
        assert rc.problem.m_ineq == rp.problem.m_ineq
    return rp, rc


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cpp_matches_python_on_reducible(seed):
    p = generate_feasible_lp(n=35, m_ineq=20, m_eq=8, seed=seed)
    p.l[2] = p.u[2] = 1.0
    p.l[5] = p.u[5] = -2.0
    K = p.K.toarray()
    single = np.zeros((1, p.n)); single[0, 9] = 2.0
    dup = K[1:2] * -3.0 if False else K[1:2] * 3.0
    p.K = sp.csr_matrix(np.vstack([single, dup, K]))
    p.q = np.concatenate([[p.l[9] * 2.0 - 1.0], p.q[1:2] * 3.0 - 1.0, p.q])
    p.m_ineq += 2
    _compare(p)


def test_cpp_detects_infeasible():
    from tpdlp.problem import LPProblem

    p = LPProblem(
        c=np.array([1.0]), K=sp.csr_matrix(np.zeros((1, 1))),
        q=np.array([1.0]), m_ineq=0, l=np.array([0.0]), u=np.array([10.0]),
    )
    r = presolve(p, backend="cpp")
    assert r.status == Status.PRIMAL_INFEASIBLE


def test_cpp_full_reduction_solved():
    from tpdlp.problem import LPProblem

    p = LPProblem(
        c=np.array([1.0, 1.0]),
        K=sp.csr_matrix(np.array([[1.0, 1.0]])),
        q=np.array([3.0]), m_ineq=1,
        l=np.array([2.0, 0.0]), u=np.array([2.0, 10.0]),
    )
    r = presolve(p, backend="cpp")
    assert r.status == Status.SOLVED
    x = postsolve(np.zeros(0), r.data)
    np.testing.assert_allclose(x, [2.0, 1.0], atol=1e-9)
