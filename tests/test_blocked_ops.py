"""Block-ELL operator tests: layout exactness, scaling, solver
integration."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.ops.blocked import BlockEllOp
from tpdlp.ops.dense import DenseOp
from tests.oracles import solve_oracle


@pytest.mark.parametrize(
    "m,n,density", [(37, 23, 0.2), (300, 517, 0.02), (8, 128, 1.0)]
)
def test_blocked_matches_dense(rng, m, n, density):
    K = sp.random(m, n, density=density, random_state=rng, format="coo")
    K.data = rng.standard_normal(K.nnz)
    op = BlockEllOp.from_scipy(K, jnp.float64)
    dense = DenseOp(jnp.asarray(K.toarray(), jnp.float64))
    x = jnp.asarray(rng.standard_normal(n))
    y = jnp.asarray(rng.standard_normal(m))
    np.testing.assert_allclose(
        np.asarray(op.mv(x)), np.asarray(dense.mv(x)), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(y)), np.asarray(dense.rmv(y)), rtol=1e-12, atol=1e-12
    )
    X = jnp.asarray(rng.standard_normal((n, 3)))
    np.testing.assert_allclose(
        np.asarray(op.mm(X)), np.asarray(dense.mm(X)), rtol=1e-12, atol=1e-12
    )
    for ord_ in ("inf", 1.0):
        np.testing.assert_allclose(
            np.asarray(op.row_abs_norms(ord_)),
            np.asarray(dense.row_abs_norms(ord_)), rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(op.col_abs_norms(ord_)),
            np.asarray(dense.col_abs_norms(ord_)), rtol=1e-12,
        )


def test_blocked_scale_matches(rng):
    K = sp.random(50, 70, density=0.1, random_state=rng, format="coo")
    K.data = rng.standard_normal(K.nnz)
    op = BlockEllOp.from_scipy(K, jnp.float64)
    dr = jnp.asarray(rng.uniform(0.5, 2.0, 50))
    dc = jnp.asarray(rng.uniform(0.5, 2.0, 70))
    x = jnp.asarray(rng.standard_normal(70))
    y = jnp.asarray(rng.standard_normal(50))
    scaled = op.scale(dr, dc)
    expect = np.asarray(dr)[:, None] * K.toarray() * np.asarray(dc)
    np.testing.assert_allclose(
        np.asarray(scaled.mv(x)), expect @ np.asarray(x), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(scaled.rmv(y)), expect.T @ np.asarray(y), rtol=1e-12
    )


def test_solver_with_blocked_operator():
    p = generate_feasible_lp(n=60, m_ineq=35, m_eq=10, density=0.1, seed=41)
    from tpdlp.solver.solve import _build_device_problem
    import jax.numpy as jnp

    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    op = BlockEllOp.from_scipy(sp.csr_matrix(p.K), jnp.float64)
    c = jnp.asarray(p.c); q = jnp.asarray(p.q)
    l = jnp.asarray(p.l); u = jnp.asarray(p.u)
    from tpdlp.solver.loop import run_chunk
    from tpdlp.solver.solve import _eta_omega_init
    from tpdlp.solver.state import init_state
    pb = _build_device_problem(op, c, q, l, u, p.m_ineq, cfg)
    eta0, omega0 = _eta_omega_init(pb, cfg, 0)
    st = init_state(pb, eta0, omega0)
    st = run_chunk(st, pb, jnp.int32(60_000), cfg)
    assert int(st.status) == int(Status.SOLVED)
    x = np.asarray(pb.d_col * st.x)
    o = solve_oracle(p)
    np.testing.assert_allclose(p.c @ x, o.fun, rtol=1e-3, atol=1e-3)
