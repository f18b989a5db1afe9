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


def test_cpp_matches_python_dominated_columns():
    """Parity on an instance with planted dominated columns."""
    p = generate_feasible_lp(n=30, m_ineq=25, m_eq=0, seed=9)
    K = p.K.toarray()
    # Plant a dominated column: entries <= 0 in inequality rows, c >= 0.
    K[:, 4] = -np.abs(K[:, 4])
    p.c[4] = abs(p.c[4]) + 0.1
    p.l[4] = -1.0
    # And a u-side one: entries >= 0, c <= 0, finite upper bound.
    K[:, 7] = np.abs(K[:, 7])
    p.c[7] = -abs(p.c[7]) - 0.1
    p.u[7] = 3.0
    p.K = sp.csr_matrix(K)
    rp, rc = _compare(p)
    fixed = dict(zip(rp.data.fixed_idx.tolist(), rp.data.fixed_val.tolist()))
    assert fixed.get(4) == -1.0
    assert fixed.get(7) == 3.0


def test_cpp_matches_python_free_singleton():
    """Parity on an instance with a free column singleton in an equality
    row, including the substitution stack."""
    p = generate_feasible_lp(n=25, m_ineq=15, m_eq=6, seed=4)
    K = p.K.toarray()
    # Plant: new free variable appearing only in one equality row.
    col = np.zeros((p.m, 1))
    col[p.m_ineq + 2, 0] = 2.5
    p.K = sp.csr_matrix(np.hstack([K, col]))
    p.c = np.concatenate([p.c, [0.7]])
    p.l = np.concatenate([p.l, [-np.inf]])
    p.u = np.concatenate([p.u, [np.inf]])
    rp, rc = _compare(p)
    assert len(rp.data.subst_idx) >= 1
    np.testing.assert_array_equal(rc.data.subst_idx, rp.data.subst_idx)
    np.testing.assert_allclose(rc.data.subst_scale, rp.data.subst_scale)
    np.testing.assert_allclose(rc.data.subst_rhs, rp.data.subst_rhs)
    np.testing.assert_array_equal(rc.data.subst_indptr, rp.data.subst_indptr)
    np.testing.assert_array_equal(rc.data.subst_cols, rp.data.subst_cols)
    np.testing.assert_allclose(rc.data.subst_vals, rp.data.subst_vals)
    # Postsolve equivalence through both stacks.
    x_red = np.linspace(0.1, 1.0, rp.problem.n)
    np.testing.assert_allclose(
        postsolve(x_red, rc.data), postsolve(x_red, rp.data)
    )


def test_cpp_matches_python_parallel_columns():
    """Parity on parallel-column merges, including the kind-tagged stack."""
    p = generate_feasible_lp(n=24, m_ineq=14, m_eq=5, seed=6)
    K = p.K.toarray()
    # Give the pair an equality-row entry so duality fixing cannot claim
    # it first, then plant proportionality with a rounding factor.
    K[p.m_ineq + 2, 4] = 0.7
    K[:, 9] = 1.5 * K[:, 4]
    p.K = sp.csr_matrix(K)
    p.c[9] = 1.5 * p.c[4]
    rp, rc = _compare(p)
    assert (rp.data.subst_kind == 1).sum() >= 1
    np.testing.assert_array_equal(rc.data.subst_kind, rp.data.subst_kind)
    np.testing.assert_array_equal(rc.data.subst_idx, rp.data.subst_idx)
    np.testing.assert_allclose(rc.data.subst_scale, rp.data.subst_scale)
    np.testing.assert_allclose(rc.data.subst_rhs, rp.data.subst_rhs)
    np.testing.assert_array_equal(rc.data.subst_cols, rp.data.subst_cols)
    np.testing.assert_allclose(rc.data.subst_vals, rp.data.subst_vals)
    x_red = (
        np.linspace(0.0, 1.0, rp.problem.n)
        if rp.problem is not None
        else np.zeros(0)
    )
    np.testing.assert_allclose(
        postsolve(x_red, rc.data), postsolve(x_red, rp.data)
    )


@pytest.mark.slow
def test_cpp_python_lockstep_fuzz():
    """Randomized planted-structure fuzz: both engines must agree on
    status, reduction counts, the reduced problem, and the primal+dual
    postsolve maps, across random fixed variables, singleton rows,
    proportional duplicate rows, doubleton equalities, and emptied
    columns."""
    from tpdlp.presolve import postsolve_dual
    from tpdlp.presolve.reductions import postsolve as ps

    rng = np.random.default_rng(99)
    for trial in range(25):
        n = int(rng.integers(8, 60))
        mi = int(rng.integers(2, 40))
        me = int(rng.integers(1, 20))
        p = generate_feasible_lp(
            n=n, m_ineq=mi, m_eq=me,
            density=float(rng.uniform(0.05, 0.5)),
            seed=int(rng.integers(0, 10_000)),
        )
        K = p.K.tolil()
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, p.n))
            p.l[j] = p.u[j] = float(rng.uniform(-2, 2))
        if rng.random() < 0.5 and p.n >= 2:
            i = int(rng.integers(0, p.m))
            K.rows[i] = [int(rng.integers(0, p.n))]
            K.data[i] = [float(rng.choice([-1.5, 2.0]))]
        if rng.random() < 0.5 and p.m >= 4:
            i0, i1 = rng.choice(p.m, 2, replace=False)
            lam = float(rng.choice([-2.0, 0.5, 3.0]))
            K.rows[int(i1)] = list(K.rows[int(i0)])
            K.data[int(i1)] = [lam * v for v in K.data[int(i0)]]
            p.q[int(i1)] = lam * p.q[int(i0)] - abs(rng.normal())
        if rng.random() < 0.5 and p.m - mi >= 1 and p.n >= 3:
            i = mi + int(rng.integers(0, p.m - mi))
            j1, j2 = rng.choice(p.n, 2, replace=False)
            K.rows[i] = sorted([int(j1), int(j2)])
            K.data[i] = [float(rng.uniform(0.5, 2)),
                         float(rng.uniform(0.5, 2))]
            p.l[int(j1)] = -50.0
            p.u[int(j1)] = 50.0
        if rng.random() < 0.3:
            j = int(rng.integers(0, p.n))
            for i in range(p.m):
                if j in K.rows[i]:
                    idx = K.rows[i].index(j)
                    K.rows[i].pop(idx)
                    K.data[i].pop(idx)
        p.K = sp.csr_matrix(K)

        rp = presolve(p, backend="python")
        rc = presolve(p, backend="cpp")
        assert rc.status == rp.status, trial
        assert rc.rows_removed == rp.rows_removed, trial
        assert rc.cols_removed == rp.cols_removed, trial
        if rp.status == Status.RUNNING:
            np.testing.assert_allclose(
                rc.problem.K.toarray(), rp.problem.K.toarray(),
                rtol=1e-10, atol=1e-12, err_msg=str(trial),
            )
            np.testing.assert_allclose(
                rc.problem.q, rp.problem.q, rtol=1e-10
            )
            x_red = rng.standard_normal(rp.problem.n)
            xa = ps(x_red, rp.data)
            np.testing.assert_allclose(
                xa, ps(x_red, rc.data), rtol=1e-9, atol=1e-10
            )
            y_red = rng.standard_normal(rp.problem.m)
            np.testing.assert_allclose(
                postsolve_dual(y_red, xa, rp.data),
                postsolve_dual(y_red, xa, rc.data),
                rtol=1e-9, atol=1e-10,
            )
        elif rp.status == Status.SOLVED:
            np.testing.assert_allclose(
                ps(np.zeros(0), rp.data), ps(np.zeros(0), rc.data),
                rtol=1e-9, atol=1e-10,
            )
