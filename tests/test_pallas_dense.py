"""Exact-fp32 dense operator tests: kernel exactness (interpret mode),
LinOp parity with DenseOp, backend routing, and solver integration.

The kernel exists because this TPU backend's fp32 `dot_general` lowers to
reduced-precision MXU passes and ignores `Precision.HIGHEST` (measured
~1e-5 relative error per matvec, which stalls tol<=1e-6 solves); see
tpdlp/ops/pallas_dense.py.  These CPU tests pin the kernel's math via the
Pallas interpreter and the operator's full LinOp contract; on-chip
exactness is asserted by the bench artifacts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdlp.ops.dense import DenseOp
from tpdlp.ops.pallas_dense import (
    ExactDenseOp,
    _pad_to_grid,
    block_shape,
    matvec_exact,
)
from tpdlp.problem import dense_op_for_backend


@pytest.mark.parametrize(
    "m,n",
    [(27, 51), (2000, 700), (8, 128), (130, 1100), (1, 1), (257, 2049)],
)
def test_kernel_interpret_matches_fp64(rng, m, n):
    """Interpret-mode kernel == fp64 reference to fp32 accumulation
    accuracy, across shapes exercising row/column padding."""
    K = rng.standard_normal((m, n)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    Kp = _pad_to_grid(jnp.asarray(K))
    bm, bn = block_shape(m, -(-n // 128) * 128)
    assert Kp.shape[0] % bm == 0 and Kp.shape[1] % bn == 0
    xp = jnp.zeros(Kp.shape[1], jnp.float32).at[:n].set(jnp.asarray(x))
    y = np.asarray(matvec_exact(Kp, xp, interpret=True))[:m]
    ref = K.astype(np.float64) @ x.astype(np.float64)
    tol = 6e-8 * max(4, n) ** 0.5 * 30  # fp32 accumulation scale
    assert np.max(np.abs(y - ref) / (1 + np.abs(ref))) < tol


def test_kernel_column_split_branch(rng):
    """Rows wider than the block budget split into >1 column grid steps
    (the revisited-output accumulation path + the (BN//128, 128) x
    blocks — the lowering round 3 fixed for mittelmann-l)."""
    m, n = 16, 9000
    n128 = -(-n // 128) * 128
    bm, bn = block_shape(m, n128)
    assert bn < n128, "shape must exercise the split branch"
    assert bn % 1024 == 0, "split BN must be Mosaic-tileable for x blocks"
    K = rng.standard_normal((m, n)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    Kp = _pad_to_grid(jnp.asarray(K))
    assert Kp.shape[1] % bn == 0 and Kp.shape[1] // bn > 1
    xp = jnp.zeros(Kp.shape[1], jnp.float32).at[:n].set(jnp.asarray(x))
    y = np.asarray(matvec_exact(Kp, xp, interpret=True))[:m]
    ref = K.astype(np.float64) @ x.astype(np.float64)
    tol = 6e-8 * n**0.5 * 30
    assert np.max(np.abs(y - ref) / (1 + np.abs(ref))) < tol


def test_padding_zero_rows_cols(rng):
    """Padded rows produce exactly zero output; padded columns of x are
    never read (zero contribution)."""
    m, n = 100, 300
    K = rng.standard_normal((m, n)).astype(np.float32)
    Kp = _pad_to_grid(jnp.asarray(K))
    x = jnp.asarray(rng.standard_normal(Kp.shape[1]).astype(np.float32))
    y = np.asarray(matvec_exact(Kp, x, interpret=True))
    assert np.all(y[m:] == 0.0)


def test_exact_op_linop_parity(rng):
    """ExactDenseOp == DenseOp on every LinOp method (CPU: both XLA)."""
    m, n = 77, 130
    K = rng.standard_normal((m, n)).astype(np.float32)
    op = ExactDenseOp.build(jnp.asarray(K))
    ref = DenseOp(jnp.asarray(K))
    assert op.shape == (m, n)
    assert op.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(op.mat), K, rtol=0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    y = jnp.asarray(rng.standard_normal(m).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op.mv(x)), np.asarray(ref.mv(x)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(y)), np.asarray(ref.rmv(y)), rtol=1e-4, atol=1e-4
    )
    X = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((m, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(op.mm(X)), np.asarray(ref.mm(X)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(op.rmm(Y)), np.asarray(ref.rmm(Y)), rtol=1e-4, atol=1e-4
    )
    for ord_ in ("inf", 1.0, 2.0):
        np.testing.assert_allclose(
            np.asarray(op.row_abs_norms(ord_)),
            np.asarray(ref.row_abs_norms(ord_)), rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(op.col_abs_norms(ord_)),
            np.asarray(ref.col_abs_norms(ord_)), rtol=1e-4,
        )
    # scale: padded diagonals must land on the padded slabs correctly
    dr = jnp.asarray(rng.uniform(0.5, 2.0, m).astype(np.float32))
    dc = jnp.asarray(rng.uniform(0.5, 2.0, n).astype(np.float32))
    s, rs = op.scale(dr, dc), ref.scale(dr, dc)
    np.testing.assert_allclose(
        np.asarray(s.mv(x)), np.asarray(rs.mv(x)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s.rmv(y)), np.asarray(rs.rmv(y)), rtol=1e-4, atol=1e-4
    )
    # astype keeps logical dims; fp64 routes off-kernel by design
    o64 = op.astype(jnp.float64)
    assert o64.dtype == jnp.float64 and o64.shape == (m, n)
    # pytree round trip under jit (while_loop carries need this)
    jitted = jax.jit(lambda o, v: o.mv(v))
    np.testing.assert_allclose(
        np.asarray(jitted(op, x)), np.asarray(op.mv(x)),
        rtol=1e-4, atol=1e-4,
    )


def test_dense_op_for_backend_routing(rng):
    """Off-TPU the chooser returns the plain MXU DenseOp; exact=False
    always does."""
    mat = jnp.asarray(rng.standard_normal((10, 12)).astype(np.float32))
    assert jax.default_backend() == "cpu"
    assert isinstance(dense_op_for_backend(mat), DenseOp)
    assert isinstance(dense_op_for_backend(mat, exact=False), DenseOp)


def test_exact_op_in_solve_loop(rng):
    """A solve driven through ExactDenseOp converges to the oracle —
    the operator satisfies the full solver contract (Ruiz scaling,
    power iteration, carried products)."""
    from tests.oracles import solve_oracle
    from tpdlp import SolverConfig, Status
    from tpdlp.io.generator import generate_feasible_lp
    from tpdlp.problem import device_problem
    from tpdlp.scaling.ruiz import scale_problem
    from tpdlp.solver.loop import run_chunk
    from tpdlp.solver.power_iteration import spectral_norm_estimate
    from tpdlp.solver.state import init_state

    problem = generate_feasible_lp(n=40, m_ineq=20, m_eq=10, density=0.4,
                                   seed=3)
    cfg = SolverConfig(tol=1e-6, max_kkt=20_000, scaling="ruiz",
                       adaptive=True, primal_weight_update=True)
    op = ExactDenseOp.build(jnp.asarray(problem.K.toarray(), jnp.float32))
    c = jnp.asarray(problem.c, jnp.float32)
    q = jnp.asarray(problem.q, jnp.float32)
    l = jnp.asarray(problem.l, jnp.float32)
    u = jnp.asarray(problem.u, jnp.float32)
    op_s, c_s, q_s, l_s, u_s, d_row, d_col = scale_problem(
        op, c, q, l, u, method=cfg.scaling, ruiz_iters=cfg.ruiz_iters,
        ruiz_eps=cfg.ruiz_eps, pc_alpha=cfg.pock_chambolle_alpha,
    )
    pb = device_problem(
        op_s, c_s, q_s, l_s, u_s, problem.m_ineq,
        d_row=d_row, d_col=d_col, c0=c, q0=q, l0=l, u0=u,
    )
    eta = cfg.eta_safety / spectral_norm_estimate(
        pb.op, jax.random.PRNGKey(0), cfg.power_iters
    )
    c_norm, q_norm = jnp.linalg.norm(pb.c), jnp.linalg.norm(pb.q)
    omega = jnp.where(
        (q_norm > 1e-6) & (c_norm > 1e-6), c_norm / q_norm, 1.0
    )
    st = init_state(pb, eta, omega)
    final = run_chunk(st, pb, cfg.max_kkt, cfg)
    assert int(final.status) == Status.SOLVED
    x = np.asarray(final.x * pb.d_col, np.float64)
    obj = float(problem.c @ x)
    oracle = solve_oracle(problem)
    assert abs(obj - oracle.fun) <= 1e-4 * (1 + abs(oracle.fun))
