"""Presolve/postsolve round-trip tests (reference round trip:
Packages/prepostsolve.py + papilo_wrapper.cpp)."""

import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.presolve import PostsolveData, postsolve, presolve
from tpdlp.problem import LPProblem
from tests.oracles import solve_oracle


def _lp(c, K, q, m_ineq, l, u, name="t"):
    return LPProblem(
        c=np.asarray(c, float), K=sp.csr_matrix(np.asarray(K, float)),
        q=np.asarray(q, float), m_ineq=m_ineq,
        l=np.asarray(l, float), u=np.asarray(u, float), name=name,
    )


def test_fixed_variable_cascade_solves_fully():
    # x0 fixed at 2 -> row becomes x1 >= 1 (singleton) -> x1 empty column
    # with c1 > 0 -> fixed at 1.  The presolver solves the whole LP.
    p = _lp([1, 1], [[1, 1]], [3], 1, [2, 0], [2, 10])
    r = presolve(p)
    assert r.status == Status.SOLVED
    x = postsolve(np.zeros(0), r.data)
    np.testing.assert_allclose(x, [2.0, 1.0], atol=1e-9)
    assert r.data.obj_offset == pytest.approx(3.0)


def test_singleton_rows_become_bounds():
    # Rows: 2 x0 >= 4  ->  l0 = 2;  x1 = 5 (equality singleton).
    p = _lp(
        [1, 1, 1],
        [[2, 0, 0], [0, 1, 0], [1, 1, 1]],
        [4, 5, 6],
        1,  # first row inequality; second+third equality
        [0, 0, 0], [10, 10, 10],
    )
    r = presolve(p)
    # The singleton rows force l0 = 2 and x1 = 5, which contradicts the
    # equality x0 + x1 + x2 = 6 (x0 + x2 = 1 < 2).  The oracle confirms the
    # fixture is infeasible (HiGHS status 2); with the parallel-column
    # reduction the engine now proves it outright.
    assert r.status == Status.PRIMAL_INFEASIBLE
    assert r.rows_removed >= 2
    # (Since round 2 the row-activity pass proves infeasibility before the
    # fixed-variable substitution runs, so fixed_idx may stay empty.)


def test_empty_row_infeasible():
    p = _lp([1], [[0.0]], [1.0], 0, [0], [10])  # 0 == 1
    r = presolve(p)
    assert r.status == Status.PRIMAL_INFEASIBLE


def test_empty_column_unbounded():
    p = _lp([0, -1], [[1, 0]], [1], 1, [0, 0], [10, np.inf])
    r = presolve(p)
    assert r.status == Status.DUAL_INFEASIBLE


def test_duplicate_rows_merged():
    # Rows 0 and 1 proportional (x0 + x1 >= 1, 2x0 + 2x1 >= 4 -> keep >= 2).
    p = _lp(
        [1, 1],
        [[1, 1], [2, 2], [1, -1]],
        [1, 4, 0],
        3,
        [0, 0], [10, 10],
    )
    r = presolve(p)
    assert r.status == Status.RUNNING
    assert r.rows_removed >= 1
    o_full = solve_oracle(p)
    # solve_oracle includes the reduced problem's obj_offset (accumulated
    # presolve-fixed contributions), so the two agree directly.
    o_red = solve_oracle(r.problem)
    assert o_full.fun == pytest.approx(o_red.fun)


def test_contradictory_duplicate_equalities():
    p = _lp([1, 1], [[1, 2], [2, 4]], [1, 3], 0, [0, 0], [10, 10])
    r = presolve(p)
    assert r.status == Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_presolve_solve_postsolve_roundtrip(seed):
    p = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=seed)
    # Plant reducible structure: fix two vars, add a singleton row and a
    # duplicate row.
    p.l[3] = p.u[3] = 1.5
    p.l[7] = p.u[7] = -0.5
    K = p.K.toarray()
    single = np.zeros((1, p.n)); single[0, 11] = 1.0
    dup = K[0:1] * 2.0
    p.K = sp.csr_matrix(np.vstack([single, dup, K]))
    p.q = np.concatenate([[p.l[11] - 1.0], p.q[0:1] * 2.0 - 0.5, p.q])
    p.m_ineq = p.m_ineq + 2

    o = solve_oracle(p)
    assert o.status == 0

    r = presolve(p)
    assert r.status == Status.RUNNING
    assert r.cols_removed >= 2 and r.rows_removed >= 2

    res = solve(r.problem, SolverConfig(tol=1e-7, max_kkt=80_000,
                                        scaling="ruiz"))
    assert res.status == Status.SOLVED
    x = postsolve(res.x, r.data)
    assert x.shape == (p.n,)
    # res.objective already includes the reduced problem's obj_offset.
    np.testing.assert_allclose(res.objective, o.fun, rtol=1e-3, atol=1e-3)
    # Postsolved point is feasible for the original problem.
    Kx = p.K @ x
    assert np.all(Kx[: p.m_ineq] >= p.q[: p.m_ineq] - 1e-4)
    np.testing.assert_allclose(Kx[p.m_ineq:], p.q[p.m_ineq:], atol=1e-4)
    assert np.all(x >= p.l - 1e-9) and np.all(x <= p.u + 1e-9)


def test_postsolve_data_save_load(tmp_path):
    p = generate_feasible_lp(n=20, m_ineq=10, m_eq=5, seed=5)
    p.l[2] = p.u[2] = 3.0
    r = presolve(p)
    f = tmp_path / "transform"
    r.data.save(f)
    loaded = PostsolveData.load(f)
    assert loaded.n_orig == r.data.n_orig
    np.testing.assert_array_equal(loaded.col_map, r.data.col_map)
    np.testing.assert_array_equal(loaded.fixed_idx, r.data.fixed_idx)


def test_file_level_round_trip(tmp_path):
    """presolve_mps / postsolve_solution — the reference wrapper's surface
    (papilo_wrapper.cpp:11-50), driven through MPS + transformation files."""
    from tpdlp import read_mps, write_mps
    from tpdlp.presolve import presolve_mps, postsolve_solution

    p = generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=11)
    # Plant reducible structure: fix one variable via equal bounds.
    p.l[3] = p.u[3] = 1.5
    orig = tmp_path / "orig.mps"
    red = tmp_path / "reduced.mps"
    tf = tmp_path / "transform.npz"
    write_mps(p, str(orig))

    stats = presolve_mps(str(orig), str(red), str(tf))
    assert stats["cols_removed"] >= 1
    assert stats["status"] == "Reduced"

    reduced = read_mps(str(red))
    r = solve(reduced, SolverConfig(tol=1e-8, scaling="ruiz", adaptive=True))
    assert r.status == Status.SOLVED
    x_full = postsolve_solution(r.x, str(tf))

    p_orig = read_mps(str(orig))
    oracle = solve_oracle(p_orig)
    obj = float(np.dot(p_orig.c, x_full))
    assert obj == pytest.approx(oracle.fun, abs=1e-5)
    assert x_full[3] == pytest.approx(1.5)


def test_dominated_column_duality_fixing():
    """A column with only nonpositive inequality entries and c >= 0 is
    forced to its lower bound (PaPILO DualFix); the cascade solves fully."""
    p = _lp([1, 1], [[-1, 1]], [0], 1, [0, 1], [np.inf, 5])
    r = presolve(p)
    assert r.status == Status.SOLVED
    x = postsolve(np.zeros(0), r.data)
    np.testing.assert_allclose(x, [0.0, 1.0], atol=1e-12)


def test_dominated_column_dual_infeasible():
    """c < 0 with all-nonnegative inequality entries and u = +inf certifies
    dual infeasibility (x -> +inf is improving and feasible)."""
    p = _lp([-1, 1], [[1, 1]], [0], 1, [0, 0], [np.inf, 1])
    r = presolve(p)
    assert r.status == Status.DUAL_INFEASIBLE


def test_dominated_column_no_false_positive_with_equality():
    """Equality-row membership blocks duality fixing (dual sign is free)."""
    p = _lp([1, 1], [[-1, 0], [1, 1]], [0, 2], 1, [0, 0], [10, 10])
    # col0 is in an equality row (row 1): must NOT be fixed by domination.
    r = presolve(p)
    if r.status == Status.RUNNING:
        from tpdlp import SolverConfig, solve
        s = solve(r.problem, SolverConfig(tol=1e-8))
        x = postsolve(s.x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
    oracle = solve_oracle(p)
    np.testing.assert_allclose(
        float(p.c @ x), oracle.fun, atol=1e-6
    )


def test_free_singleton_column_substitution():
    """A free variable with one nonzero in an equality row is substituted
    out; postsolve recovers it from the row (PaPILO column singletons)."""
    from tpdlp import SolverConfig, solve

    # min x0 + 3 x1 + x2   s.t.  x0 + x1 >= 2 ;  x1 + 2 x2 = 4 ;
    # x2 free (l=-inf, u=+inf), appears only in the equality row.
    p = _lp(
        [1, 3, 1],
        [[1, 1, 0], [0, 1, 2]],
        [2, 4],
        1,
        [0, 0, -np.inf],
        [10, 10, np.inf],
    )
    r = presolve(p)
    # A kind-0 substitution entry must exist (since round 2 the activity
    # pass may bound x2 first, in which case the doubleton pass eliminates
    # x1 through the same row instead — either way one variable is
    # substituted out through the equality row).
    assert (r.data.subst_kind == 0).sum() == 1
    assert r.data.subst_row[r.data.subst_kind == 0][0] == 1  # the eq row
    oracle = solve_oracle(p)
    if r.status == Status.RUNNING:
        assert r.problem.n <= 2  # one variable eliminated
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
    # Recovered x2 must satisfy the equality row exactly.
    np.testing.assert_allclose(x[1] + 2 * x[2], 4.0, atol=1e-7)
    np.testing.assert_allclose(float(p.c @ x), oracle.fun, atol=1e-6)


def test_free_singleton_postsolve_save_load(tmp_path):
    """The substitution stack survives the transformation-file round trip."""
    p = _lp(
        [1, 3, 1],
        [[1, 1, 0], [0, 1, 2]],
        [2, 4],
        1,
        [0, 0, -np.inf],
        [10, 10, np.inf],
    )
    r = presolve(p)
    path = tmp_path / "tf.npz"
    r.data.save(path)
    data2 = PostsolveData.load(path)
    x1 = postsolve(np.array([2.0, 0.0])[: len(r.data.col_map)], r.data)
    x2 = postsolve(np.array([2.0, 0.0])[: len(data2.col_map)], data2)
    np.testing.assert_allclose(x1, x2)


def test_parallel_columns_merge_and_split():
    """Proportional columns with consistent costs merge; postsolve splits
    the merged value into a feasible pair (PaPILO ParallelCols)."""
    from tpdlp import SolverConfig, solve

    # col1 = 2 * col0, c1 = 2 * c0 -> mergeable; col2 independent.
    p = _lp(
        [1, 2, 1],
        [[1, 2, 1], [3, 6, 0]],
        [4, 3],
        2,
        [0, 0, 0],
        [5, 5, 10],
    )
    r = presolve(p)
    assert (r.data.subst_kind == 1).sum() >= 1
    oracle = solve_oracle(p)
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
    assert float(p.c @ x) == pytest.approx(oracle.fun, abs=1e-6)
    K = p.K.toarray()
    assert np.all(K @ x >= p.q - 1e-7)
    assert np.all(x >= p.l - 1e-9) and np.all(x <= p.u + 1e-9)


def test_parallel_columns_negative_lambda_and_inf_bounds():
    """lam < 0 merge with an infinite bound on the dropped side still
    splits feasibly; cost-inconsistent pairs are NOT merged."""
    from tpdlp import SolverConfig, solve

    # col1 = -1 * col0; c1 = -c0 (consistent).  u1 = inf, u0 finite.
    p = _lp(
        [2, -2, 1],
        [[1, -1, 1], [2, -2, 0]],
        [1, -4],
        2,
        [0, 0, 0],
        [3, np.inf, 10],
    )
    r = presolve(p)
    oracle = solve_oracle(p)
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
    assert float(p.c @ x) == pytest.approx(oracle.fun, abs=1e-6)
    K = p.K.toarray()
    assert np.all(K @ x >= p.q - 1e-7)
    assert np.all(x >= p.l - 1e-9)

    # Cost-inconsistent proportional columns must survive.
    p2 = _lp([1, 5], [[1, 2], [3, 6]], [4, 3], 2, [0, 0], [5, 5])
    r2 = presolve(p2)
    if r2.status == Status.RUNNING:
        assert not (r2.data.subst_kind == 1).any() or r2.problem.n == 2
    s2 = (
        solve(r2.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        if r2.status == Status.RUNNING
        else None
    )
    x2 = postsolve(
        s2.x if s2 is not None else np.zeros(0), r2.data
    )
    assert float(p2.c @ x2) == pytest.approx(solve_oracle(p2).fun, abs=1e-4)


# ---- round-2 reductions: row activities, doubletons, dominated rows ----


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_row_activity_redundant_row_removed(backend):
    # x0 + x1 >= -10 with x in [0,1]^2: min activity 0 beats the rhs, so
    # the row is redundant; the cascade then solves the LP outright.
    p = _lp([1, 1], [[1, 1]], [-10], 1, [0, 0], [1, 1])
    r = presolve(p, backend=backend)
    assert r.status == Status.SOLVED
    assert r.rows_removed == 1
    x = postsolve(np.zeros(0), r.data)
    np.testing.assert_allclose(x, [0.0, 0.0], atol=1e-12)


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_row_activity_proves_infeasible(backend):
    # x0 + x1 >= 5 with x in [0,1]^2: max activity 2 < 5.
    p = _lp([1, 1], [[1, 1]], [5], 1, [0, 0], [1, 1])
    r = presolve(p, backend=backend)
    assert r.status == Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_row_activity_bound_tightening_with_dual_recovery(backend):
    # x0 + x1 >= 3, x0 in [0,10], x1 in [0,1]: the activity pass tightens
    # l0 to 2 (a kind-2 bound transfer); the cascade fixes x1 at its upper
    # bound and solves the LP.  The dual sweep must route x0's leftover
    # reduced cost back onto the dropped row: y = c0 / a = 1.
    from tpdlp.presolve import postsolve_dual

    p = _lp([1.0, 0.0], [[1, 1]], [3], 1, [0, 0], [10, 1])
    r = presolve(p, backend=backend)
    assert r.status == Status.SOLVED
    assert (r.data.subst_kind == 2).any()
    x = postsolve(np.zeros(0), r.data)
    np.testing.assert_allclose(x, [2.0, 1.0], atol=1e-9)
    y = postsolve_dual(np.zeros(0), x, r.data)
    np.testing.assert_allclose(y, [1.0], atol=1e-9)


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_doubleton_equation_eliminated(backend):
    # Equality 2 x0 + x1 = 4 with x0's implied interval [1.5, 2] inside its
    # box: x0 is substituted through the row (kind-0 entry), the inequality
    # row x0 + x2 >= 1 absorbing the fill-in.  Cascade solves the LP.
    from tpdlp.presolve import postsolve_dual

    p = _lp(
        [1.0, 0.5, 0.2],
        [[1, 0, 1], [2, 1, 0]],
        [1, 4],
        1,
        [-100, 0, 0],
        [100, 1, 5],
    )
    o = solve_oracle(p)
    r = presolve(p, backend=backend)
    assert (r.data.subst_kind == 0).any()
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
    np.testing.assert_allclose(x, o.x, atol=1e-6)
    np.testing.assert_allclose(float(p.c @ x), o.fun, rtol=1e-8)
    if r.status == Status.SOLVED:
        # Stationarity of the eliminated x0 pins the removed eq row's dual:
        # y_eq = (c0 - y_ineq) / 2 = 0.5 (the ineq row is slack).
        y = postsolve_dual(np.zeros(0), x, r.data)
        np.testing.assert_allclose(y, [0.0, 0.5], atol=1e-9)


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_duplicate_rows_equality_dominates_inequality(backend):
    # [1,1] x >= 1 is dominated by the parallel equality [2,2] x = 4.
    p = _lp(
        [1, 2], [[1, 1], [2, 2]], [1, 4], 1, [0, 0], [5, 5]
    )
    o = solve_oracle(p)
    r = presolve(p, backend=backend)
    assert r.rows_removed >= 1
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
    assert float(p.c @ x) == pytest.approx(o.fun, abs=1e-6)


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_duplicate_rows_equality_contradicts_inequality(backend):
    # [1,1] x >= 3 cannot hold when [2,2] x = 4 pins [1,1] x at 2.
    p = _lp(
        [1, 2], [[1, 1], [2, 2]], [3, 4], 1, [0, 0], [5, 5]
    )
    r = presolve(p, backend=backend)
    assert r.status == Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_duplicate_rows_antiparallel_contradiction(backend):
    # x0 + x1 >= 1 and -(x0 + x1) >= -0.5 form an empty range pair.
    # (Free bounds keep the activity pass from claiming it first.)
    p = _lp(
        [1, 1], [[1, 1], [-1, -1]], [1, -0.5], 2,
        [-np.inf, -np.inf], [np.inf, np.inf],
    )
    r = presolve(p, backend=backend)
    assert r.status == Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_duplicate_rows_rhs_winner_moves_dual(backend):
    # Duplicate inequalities where the DROPPED row's scaled rhs (4/2 = 2)
    # is the binding one: a kind-3 entry moves the recovered dual onto the
    # dropped row, scaled by lam.  The equality row x0 = x1 breaks column
    # proportionality so the parallel-columns pass cannot pre-empt the
    # duplicate-row pass.
    from tests.oracles import dual_violation
    from tpdlp.presolve import postsolve_dual

    p = _lp(
        [1, 1, 1],
        [[1, 1, 1], [2, 2, 2], [1, -1, 0.5]],
        [1, 4, 0],
        2,
        [0, 0, 0],
        [5, 5, 5],
    )
    o = solve_oracle(p)
    r = presolve(p, backend=backend)
    assert (r.data.subst_kind == 3).any()
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
        y = postsolve_dual(s.y, x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
        y = postsolve_dual(np.zeros(0), x, r.data)
    assert float(p.c @ x) == pytest.approx(o.fun, abs=1e-6)
    # Kept row carries no weight; the pair is KKT-consistent.
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    assert dual_violation(p, x, y) < 1e-5


def test_file_level_dual_postsolve(tmp_path):
    """File-level round trip recovers a KKT-consistent dual (beyond the
    reference wrapper, which is primal-only)."""
    from tests.oracles import dual_violation
    from tpdlp import read_mps, write_mps
    from tpdlp.presolve import (
        postsolve_dual_solution, postsolve_solution, presolve_mps,
    )

    p = _lp([1.0, 0.5, 0.2], [[1, 0, 1], [2, 1, 0]], [1, 4], 1,
            [-100, 0, 0], [100, 1, 5])
    src = tmp_path / "orig.mps"
    red = tmp_path / "reduced.mps"
    trans = tmp_path / "trans.npz"
    write_mps(p, str(src))
    stats = presolve_mps(str(src), str(red), str(trans), backend="cpp")
    if stats["reduced_rows"] > 0:
        rp = read_mps(str(red))
        s = solve(rp, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x_red, y_red = s.x, s.y
    else:
        x_red, y_red = np.zeros(0), np.zeros(0)
    x = postsolve_solution(x_red, str(trans))
    y = postsolve_dual_solution(y_red, x, str(trans))
    p2 = read_mps(str(src))
    assert dual_violation(p2, x, y) < 1e-5


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_aggregation_implied_free_column(backend):
    # x0 is FREE with three nonzeros {R0 ineq, R1 ineq, R2 eq}: beyond the
    # free-singleton (1 nnz) and doubleton (2-nnz row) passes, only the
    # implied-free column substitution (PaPILO Substitution/aggregation)
    # can eliminate it, pivoting on the equality row x0 + x1 + x2 = 5.
    # The activity pass first derives IMPLIED bounds for x0; the
    # boundsImplied flags must keep it effectively free.
    from tests.oracles import dual_violation
    from tpdlp.presolve import postsolve_dual

    p = _lp(
        [0.5, 1, 1, 1, 2],
        [[1, 0, 0, 1, 0], [1, 0, 0, 0, 1], [1, 1, 1, 0, 0]],
        [1, 2, 5],
        2,
        [-np.inf, 0, 0, 0, 0],
        [np.inf, 10, 10, 10, 10],
    )
    o = solve_oracle(p)
    r = presolve(p, backend=backend)
    kinds = r.data.subst_kind
    width = np.diff(r.data.subst_indptr)
    # A kind-0 entry with TWO substitution columns = the aggregation
    # (free-singleton entries have 0..many; the pivot row here has 2
    # other columns).
    assert np.any((kinds == 0) & (width == 2))
    assert r.cols_removed >= 1 and r.rows_removed >= 1
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
        y = postsolve_dual(s.y, x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
        y = postsolve_dual(np.zeros(0), x, r.data)
    assert float(p.c @ x) == pytest.approx(o.fun, abs=1e-6)
    np.testing.assert_allclose(x, o.x, atol=1e-6)
    assert dual_violation(p, x, y) < 1e-5


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_sparsify_subset_row_combination(backend):
    # Equality R0 (x0+x1+x4 = 2) has support inside R1 (x0+..+x4 = 5);
    # adding -1 * R0 to R1 cancels three entries exactly (sectional-sum
    # structure), leaving x2 + x3 = 3.  Distinct costs block the
    # parallel-column pass; real zero lower bounds block aggregation.
    from tests.oracles import dual_violation
    from tpdlp.presolve import postsolve_dual

    p = _lp(
        [1, 2, 1, 1.5, 3],
        [[1, 1, 0, 0, 1], [1, 1, 1, 1, 1]],
        [2, 5],
        0,
        [0, 0, 0, 0, 0],
        [10, 10, 10, 10, 10],
    )
    o = solve_oracle(p)
    r = presolve(p, backend=backend)
    assert (r.data.subst_kind == 4).any()
    if r.status == Status.RUNNING:
        assert r.problem.K.nnz < p.K.nnz  # strictly sparser
        s = solve(r.problem, SolverConfig(tol=1e-9, abs_gap_termination=True))
        x = postsolve(s.x, r.data)
        y = postsolve_dual(s.y, x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
        y = postsolve_dual(np.zeros(0), x, r.data)
    assert float(p.c @ x) == pytest.approx(o.fun, abs=1e-6)
    np.testing.assert_allclose(x, o.x, atol=1e-6)
    # The kind-4 entry must restore the absorbed multiplier: stationarity
    # and complementarity of the ORIGINAL pair.
    assert dual_violation(p, x, y) < 1e-5


def test_legacy_transform_file_dual_raises(tmp_path):
    """ADVICE r2: loading a round-1 transformation file (no m_orig/
    row_map) must raise a descriptive error from postsolve_dual instead
    of silently returning a length-0 dual vector."""
    from tpdlp.presolve import postsolve_dual
    from tpdlp.presolve.reductions import PostsolveData

    p = _lp([1, 1], [[1, 1]], [2], 0, [0, 0], [5, 5])
    r = presolve(p)
    path = tmp_path / "legacy.npz"
    r.data.save(path)
    # Strip the dual-info fields to emulate the round-1 format.
    z = dict(np.load(path))
    for k in ("m_orig", "row_map"):
        z.pop(k)
    np.savez(path, **z)
    data = PostsolveData.load(path)
    x = postsolve(np.zeros(len(data.col_map)), data)
    assert x.shape == (2,)  # primal postsolve still works on legacy files
    with pytest.raises(ValueError, match="predates dual postsolve"):
        postsolve_dual(np.zeros(1), x, data)


def test_dual_postsolve_mismatched_reduced_dual_raises():
    from tpdlp.presolve import postsolve_dual

    p = _lp([1, 1], [[1, 1], [1, 0]], [2, 1], 0, [0, 0], [5, 5])
    r = presolve(p)
    with pytest.raises(ValueError, match="surviving rows"):
        postsolve_dual(np.zeros(7), np.zeros(2), r.data)


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_same_column_singleton_battery_dual_exact(backend):
    """ADVICE r2 probed a degenerate case: several dual-absorbing stack
    entries from ONE pass batch on a SHARED column (eq + ineq singleton
    rows, mixed scales/signs).  The reverse sweep handles it because
    entries are processed strictly sequentially with updates visible
    through each entry's column snapshot: the latest-pushed entry absorbs
    the full remaining reduced cost first, and every earlier entry then
    re-evaluates lambda_j against the updated duals.  This battery pins
    that behavior (200-trial fuzz found zero violations)."""
    from tests.oracles import dual_violation
    from tpdlp.presolve import postsolve_dual

    rng = np.random.default_rng(77)
    checked = 0
    for _ in range(60):
        n = 4
        rows, qs, kinds = [], [], []
        for _ in range(2):  # dense coupling rows (keep the LP nontrivial)
            rows.append(rng.integers(-3, 4, n).astype(float))
            qs.append(float(rng.integers(-4, 5)))
            kinds.append(True)
        for _ in range(rng.integers(2, 5)):  # singletons on shared cols
            j = int(rng.integers(0, 2))
            a = float(rng.choice([-2.0, -1.0, 1.0, 2.0, 3.0]))
            v = float(rng.integers(-2, 3))
            rows.append(np.eye(n)[j] * a)
            qs.append(a * v)
            kinds.append(bool(rng.integers(0, 2)))
        order = np.argsort(~np.array(kinds), kind="stable")
        Km = np.array(rows)[order]
        qv = np.array(qs)[order]
        mi = int(np.array(kinds).sum())
        c = rng.integers(-3, 4, n).astype(float)
        p = _lp(c, Km, qv, mi, np.full(n, -3.0), np.full(n, 5.0))
        o = solve_oracle(p)
        if o.status != 0:
            continue
        r = presolve(p, backend=backend)
        if r.status == Status.RUNNING:
            s = solve(r.problem, SolverConfig(
                tol=1e-9, abs_gap_termination=True, max_kkt=60_000))
            if s.status != Status.SOLVED:
                continue
            x = postsolve(np.asarray(s.x), r.data)
            y = postsolve_dual(np.asarray(s.y), x, r.data)
        elif r.status == Status.SOLVED:
            x = postsolve(np.zeros(0), r.data)
            y = postsolve_dual(np.zeros(0), x, r.data)
        else:
            continue
        if abs(float(p.c @ x) - o.fun) > 1e-5:
            continue  # alternate optimum: dual check needs matching x
        assert dual_violation(p, x, y) < 1e-5
        checked += 1
    assert checked >= 20  # the battery must actually exercise the path


@pytest.mark.parametrize("backend", ["python", "cpp"])
@pytest.mark.parametrize(
    "name,c,K,q,m_ineq",
    [
        # Two dual-absorbing singleton rows on the SAME column removed in
        # one pass batch (advisor r2 scenario).  The reverse sweep is
        # safe by construction: each entry's column snapshot is taken at
        # pass START, so same-batch rows appear in EACH OTHER's
        # snapshots.  The latest-pushed entry is processed first and
        # absorbs the full remaining reduced cost (the other row's dual
        # is still the correct all-else-zero state); the earlier entry
        # then subtracts the now-assigned dual from its lambda_j, which
        # telescopes its own share to exactly zero — never double-counted.
        ("eq+ineq", [5, 1], [[1, 0], [0, 1], [1, 0]], [2, 1, 2], 2),
        ("two-ineq", [5, 1], [[1, 0], [2, 0], [0, 1]], [2, 4, 1], 3),
        ("neg-cost", [-5, 1], [[-1, 0], [-2, 0], [0, 1]], [-2, -4, 1], 3),
        ("two-eq", [5, 1], [[0, 1], [1, 0], [2, 0]], [1, 2, 4], 1),
    ],
)
def test_same_column_singleton_batch_duals_exact(backend, name, c, K, q,
                                                 m_ineq):
    from tests.oracles import dual_violation
    from tpdlp.presolve import postsolve_dual

    inf = np.inf
    p = _lp(c, K, q, m_ineq, [0, 0], [inf, inf])
    o = solve_oracle(p)
    r = presolve(p, backend=backend)
    assert r.rows_removed == 3  # every row is absorbed by the batch
    if r.status == Status.RUNNING:
        s = solve(r.problem, SolverConfig(tol=1e-9,
                                          abs_gap_termination=True))
        x = postsolve(np.asarray(s.x), r.data)
        y = postsolve_dual(np.asarray(s.y), x, r.data)
    else:
        assert r.status == Status.SOLVED
        x = postsolve(np.zeros(0), r.data)
        y = postsolve_dual(np.zeros(0), x, r.data)
    assert float(p.c @ x) == pytest.approx(o.fun, abs=1e-9)
    assert dual_violation(p, x, y) == pytest.approx(0.0, abs=1e-12)


@pytest.mark.parametrize("backend", ["python", "cpp"])
def test_dual_bound_strengthening(backend):
    """PaPILO DualInfer analog: propagated dual bounds fix a column the
    one-sign DualFix pass cannot (round-3 verdict item 7).

    Column A (singleton, u = +inf) bounds its row's dual: lambda_A =
    c_A - y0 >= 0 forces y0 <= c_A = 1.  Column B shares the row with a
    POSITIVE coefficient and c_B = 2 > c_A, so lambda_B = 2 - y0 >= 1 > 0
    for every feasible dual -> x_B pinched to its lower bound.  DualFix
    alone cannot touch B (positive inequality entry with positive cost).
    """
    from tpdlp.problem import LPProblem

    # row0 (ineq): x_A + x_B + x_C >= 1 ; row1 (ineq): x_C >= -5
    K = sp.csr_matrix(np.array([
        [1.0, 1.0, 1.0],
        [0.0, 0.0, 1.0],
    ]))
    p = LPProblem(
        c=np.array([1.0, 2.0, 0.5]),
        K=K,
        q=np.array([1.0, -5.0]),
        m_ineq=2,
        l=np.array([0.0, 0.0, -4.0]),
        u=np.array([np.inf, 5.0, 4.0]),
    )
    o = solve_oracle(p)
    assert o.status == 0
    r = presolve(p, backend=backend)
    # x_B fixed at its lower bound by dual inference.
    assert 1 in r.data.fixed_idx
    bpos = list(r.data.fixed_idx).index(1)
    assert r.data.fixed_val[bpos] == pytest.approx(0.0)
    # Objective preserved through the round trip.
    if r.problem.n:
        o2 = solve_oracle(r.problem)
        assert o2.status == 0
        x_full = postsolve(o2.x, r.data)
    else:
        x_full = postsolve(np.zeros(0), r.data)
    assert float(p.c @ x_full) + 0.0 == pytest.approx(o.fun, abs=1e-7)


def test_dual_infer_lockstep_mixed_bounds():
    """Both engines agree (reduced shapes, fixes, postsolve) on
    mixed-bound instances where the dual-inference pass has content."""
    from tpdlp.io.generator import generate_feasible_lp

    for seed in range(8):
        p = generate_feasible_lp(n=30, m_ineq=18, m_eq=6, seed=seed,
                                 bounds="mixed")
        rp = presolve(p, backend="python")
        rc = presolve(p, backend="cpp")
        assert rp.status == rc.status
        assert rp.problem.m == rc.problem.m
        assert rp.problem.n == rc.problem.n
        np.testing.assert_array_equal(rp.data.fixed_idx, rc.data.fixed_idx)
        np.testing.assert_allclose(rp.data.fixed_val, rc.data.fixed_val,
                                   rtol=1e-12, atol=1e-12)
