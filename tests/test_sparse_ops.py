"""SparseOp (BCOO) correctness against DenseOp, and sparse solves."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.ops.dense import DenseOp
from tpdlp.ops.sparse import SparseOp
from tests.oracles import solve_oracle
from tpdlp.problem import LPProblem


@pytest.fixture
def ops(rng):
    K = sp.random(37, 23, density=0.2, random_state=rng, format="csr")
    K.data = rng.standard_normal(K.nnz)
    dense = DenseOp(jnp.asarray(K.toarray(), jnp.float64))
    sparse = SparseOp.from_scipy(K, jnp.float64)
    return K, dense, sparse


def test_mv_rmv_match(ops, rng):
    K, dense, sparse = ops
    x = rng.standard_normal(23)
    y = rng.standard_normal(37)
    np.testing.assert_allclose(
        np.asarray(sparse.mv(jnp.asarray(x))),
        np.asarray(dense.mv(jnp.asarray(x))), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sparse.rmv(jnp.asarray(y))),
        np.asarray(dense.rmv(jnp.asarray(y))), rtol=1e-12,
    )


def test_mm_rmm_match(ops, rng):
    K, dense, sparse = ops
    X = rng.standard_normal((23, 3))
    Y = rng.standard_normal((37, 3))
    np.testing.assert_allclose(
        np.asarray(sparse.mm(jnp.asarray(X))),
        np.asarray(dense.mm(jnp.asarray(X))), rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sparse.rmm(jnp.asarray(Y))),
        np.asarray(dense.rmm(jnp.asarray(Y))), rtol=1e-12,
    )


def test_norms_and_scale_match(ops, rng):
    K, dense, sparse = ops
    for ord_ in ("inf", 1.0, 2.0):
        np.testing.assert_allclose(
            np.asarray(sparse.row_abs_norms(ord_)),
            np.asarray(dense.row_abs_norms(ord_)), rtol=1e-12, atol=1e-300,
        )
        np.testing.assert_allclose(
            np.asarray(sparse.col_abs_norms(ord_)),
            np.asarray(dense.col_abs_norms(ord_)), rtol=1e-12, atol=1e-300,
        )
    dr = jnp.asarray(rng.uniform(0.5, 2.0, 37))
    dc = jnp.asarray(rng.uniform(0.5, 2.0, 23))
    x = jnp.asarray(rng.standard_normal(23))
    np.testing.assert_allclose(
        np.asarray(sparse.scale(dr, dc).mv(x)),
        np.asarray(dense.scale(dr, dc).mv(x)), rtol=1e-12,
    )


@pytest.mark.parametrize("fmt", ["sparse", "auto"])
def test_sparse_solve_matches_oracle(fmt):
    p = generate_feasible_lp(n=50, m_ineq=30, m_eq=10, density=0.15, seed=31)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    r = solve(p, cfg, matrix_format=fmt)
    o = solve_oracle(p)
    assert r.status == Status.SOLVED and o.status == 0
    np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3, atol=1e-3)


def test_sparse_equals_dense_trajectory():
    p = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, density=0.2, seed=32)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000)
    r_d = solve(p, cfg, matrix_format="dense")
    r_s = solve(p, cfg, matrix_format="sparse")
    assert r_d.status == r_s.status == Status.SOLVED
    np.testing.assert_allclose(r_s.objective, r_d.objective, rtol=1e-8)
    assert abs(r_s.iterations - r_d.iterations) <= 2


def test_device_densify_matches_host_densify():
    """COO-triplet device-side densification produces exactly the dense
    matrix (including duplicate-entry summation)."""
    import scipy.sparse as sp

    from tpdlp.problem import to_device_arrays

    rng = np.random.default_rng(3)
    m, n = 64, 96
    K = sp.random(m, n, density=0.05, random_state=7, format="coo")
    # Inject duplicate coordinates (must sum, standard COO semantics).
    K = sp.coo_matrix(
        (
            np.concatenate([K.data, [1.5, -2.0]]),
            (
                np.concatenate([K.row, [3, 3]]),
                np.concatenate([K.col, [5, 5]]),
            ),
        ),
        shape=(m, n),
    )
    p = LPProblem(
        c=rng.standard_normal(n), K=K.tocsr(), q=rng.standard_normal(m),
        m_ineq=m // 2, l=np.zeros(n), u=np.full(n, np.inf), name="t",
    )
    op, *_ = to_device_arrays(p, jnp.float64)
    np.testing.assert_allclose(
        np.asarray(op.mat), K.toarray(), rtol=0, atol=0
    )
