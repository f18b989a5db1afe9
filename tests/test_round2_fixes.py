"""Regression tests for the round-2 fix batch: warm-start coordinate frame,
NaN/divergence detection, time-budget-before-first-chunk, nnz-keyed fp64
guard, and the non-densifying autotune."""

import time

import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve


def test_warm_start_from_solution_under_ruiz_terminates_immediately():
    """Warm starts are ORIGINAL-frame points; feeding the exact solution
    back must terminate within the first restart cycle even when scaling
    is on.  (Round-1 bug: the point was consumed as a scaled iterate, so a
    warm start from the exact solution still cost thousands of iterations
    under ruiz.)"""
    problem = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=11)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, scaling="ruiz", adaptive=True
    )
    cold = solve(problem, cfg)
    assert cold.status == Status.SOLVED
    assert cold.iterations > 100  # meaningful cold-start work

    warm = solve(problem, cfg, x0=cold.x, y0=cold.y)
    assert warm.status == Status.SOLVED
    assert warm.iterations <= 2 * cfg.restart_period, (
        f"warm-from-solution took {warm.iterations} iterations "
        f"(cold: {cold.iterations}) — frame bug regression"
    )
    assert warm.objective == pytest.approx(cold.objective, rel=1e-4)


def test_warm_start_frame_consistency_scaled_vs_unscaled():
    """The same original-frame warm start must help equally with and
    without scaling (it is mapped into whatever frame the loop uses)."""
    problem = generate_feasible_lp(n=30, m_ineq=20, m_eq=5, seed=12)
    base = SolverConfig(tol=1e-6, max_kkt=60_000)
    ref = solve(problem, base)
    assert ref.status == Status.SOLVED
    for scaling in ("none", "ruiz", "ruiz+pc"):
        warm = solve(
            problem, base.replace(scaling=scaling), x0=ref.x, y0=ref.y
        )
        assert warm.status == Status.SOLVED
        assert warm.iterations <= 2 * base.restart_period, scaling


def _free_variable_lp(seed):
    """An equality-constrained LP with unbounded variables: with a stepsize
    far above 1/||K|| the unclamped primal update diverges exponentially to
    inf/NaN (box-bounded problems merely oscillate)."""
    from tpdlp.problem import LPProblem

    rng = np.random.default_rng(seed)
    n, m = 20, 12
    A = rng.normal(size=(m, n))
    x_star = rng.normal(size=n)
    return LPProblem(
        c=rng.normal(size=n),
        K=A,
        q=A @ x_star,
        m_ineq=0,
        l=np.full(n, -np.inf),
        u=np.full(n, np.inf),
        name="free-divergent",
    )


def test_fp32_divergence_exits_with_numerical_error():
    """The loop must exit promptly with NUMERICAL_ERROR on NaN/Inf iterates
    instead of burning the whole KKT budget."""
    problem = _free_variable_lp(13)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=100_000, eta_safety=50.0, adaptive=False
    )
    result = solve(problem, cfg, dtype=np.float32)
    assert result.status == Status.NUMERICAL_ERROR
    assert result.kkt_passes < 5_000, (
        f"divergence burned {result.kkt_passes} KKT passes before detection"
    )
    assert result.status_string == "Unsolved (Numerical error)"


def test_halpern_divergence_also_detected():
    problem = _free_variable_lp(14)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=100_000, eta_safety=50.0,
        step_scheme="halpern",
    )
    result = solve(problem, cfg, dtype=np.float32)
    assert result.status == Status.NUMERICAL_ERROR
    assert result.kkt_passes < 5_000


def test_exhausted_time_budget_skips_first_chunk():
    """With the wall clock already spent, solve() must report TIME_LIMIT
    without dispatching the fused first chunk (ADVICE round 1)."""
    problem = generate_feasible_lp(n=30, m_ineq=20, m_eq=5, seed=15)
    cfg = SolverConfig(tol=1e-12, max_kkt=100_000, time_limit=5.0)
    result = solve(problem, cfg, time_used=10.0)
    assert result.status == Status.TIME_LIMIT
    assert result.kkt_passes == 0


def test_f64_guard_keys_on_nnz_for_sparse():
    from tpdlp.solver.solve import _F64_DENSE_ELEM_LIMIT, _f64_program_elems

    m, n = 4000, 3000  # dense envelope 1.2e7 > limit, nnz tiny
    K = sp.random(m, n, density=1e-4, format="csr", random_state=0)
    problem = type(
        "P", (), {"m": m, "n": n, "K": K}
    )()
    assert _f64_program_elems(problem, "dense") == m * n
    assert _f64_program_elems(problem, "sparse") == K.nnz
    assert _f64_program_elems(problem, "sparse") < _F64_DENSE_ELEM_LIMIT
    # auto on a matrix whose dense form fits the autotune budget scores as
    # dense (the tuner may legitimately pick dense).
    assert _f64_program_elems(problem, "auto") == m * n


def test_autotune_auto_never_densifies_above_budget():
    """matrix_format='auto' must solve a sparse instance whose dense form
    exceeds the memory budget without ever allocating m*n elements."""
    from tpdlp.ops.autotune import choose_operator
    from tpdlp.ops.dense import DenseOp

    rng = np.random.default_rng(0)
    m, n = 600, 500
    K = sp.random(m, n, density=0.01, format="csr", random_state=1)
    # Budget below the dense bytes (600*500*4 = 1.2 MB): dense must not
    # even be constructed as a candidate.
    op, label = choose_operator(K, np.float32, dense_bytes_budget=100_000)
    assert label != "dense"
    assert not isinstance(op, DenseOp)

    # And with a roomy budget the dense candidate is allowed again.
    op2, label2 = choose_operator(K, np.float32)
    assert label2 in ("dense", "sparse", "blocked")


def test_solve_auto_format_on_sparse_instance():
    problem = generate_feasible_lp(n=50, m_ineq=30, m_eq=10, seed=16)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    r_auto = solve(problem, cfg, matrix_format="auto")
    r_dense = solve(problem, cfg, matrix_format="dense")
    assert r_auto.status == Status.SOLVED
    assert r_auto.objective == pytest.approx(r_dense.objective, rel=1e-4)


def test_escalation_warm_starts_correctly_scaled():
    """The fp32 -> fp64 escalation warm start crosses the frame boundary
    (stage-1 result is original-frame); the fp64 tail must converge fast
    from it, not re-solve."""
    problem = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=17)
    cfg = SolverConfig(
        tol=1e-8, max_kkt=200_000, scaling="ruiz",
        precision_escalation=True, escalation_tol=1e-6,
    )
    t0 = time.perf_counter()
    # dtype=None on CPU defaults to fp64 directly, so force the escalated
    # path via the private entry.
    from tpdlp.solver.solve import _solve_escalated

    result = _solve_escalated(problem, cfg)
    assert result.status == Status.SOLVED
    assert result.primal_res <= 1e-8 * (1 + np.linalg.norm(problem.q))
    assert time.perf_counter() - t0 < 120


# ---- round-2 full-tree review fixes ----


def test_presolve_passes_history_through():
    p = generate_feasible_lp(n=25, m_ineq=15, m_eq=5, seed=3)
    p.l[2] = p.u[2] = 1.0
    r = solve(
        p, SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz"),
        presolve="python", log_history=True,
    )
    assert r.status == Status.SOLVED
    assert r.history is not None and len(r.history) >= 1


def test_presolve_warm_start_raises():
    p = generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=0)
    with pytest.raises(ValueError, match="warm start"):
        solve(p, SolverConfig(), presolve="python",
              x0=np.zeros(p.n), y0=np.zeros(p.m))


def test_pinched_infinite_bounds_rejected():
    from tpdlp.problem import LPProblem
    import scipy.sparse as sp

    with pytest.raises(ValueError, match="infinite"):
        LPProblem(
            c=np.array([1.0]), K=sp.csr_matrix(np.array([[1.0]])),
            q=np.array([0.0]), m_ineq=1,
            l=np.array([-np.inf]), u=np.array([-np.inf]),
        ).validate()


def test_write_mps_declares_empty_zero_cost_column():
    import scipy.sparse as sp

    from tpdlp import read_mps, write_mps
    from tpdlp.problem import LPProblem

    p = LPProblem(
        c=np.array([1.0, 0.0]),
        K=sp.csr_matrix(np.array([[1.0, 0.0]])),
        q=np.array([1.0]), m_ineq=1,
        l=np.array([0.0, 0.0]), u=np.array([10.0, 5.0]),
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mps")
        write_mps(p, path)
        p2 = read_mps(path)
    assert p2.n == 2  # the empty zero-cost column survives the round trip


def test_bounds_without_set_name_parse():
    import tempfile, os

    from tpdlp import read_mps

    text = """NAME T
ROWS
 N COST
 G R1
COLUMNS
 X1 COST 1.0 R1 1.0
 X2 COST 1.0 R1 1.0
RHS
 RHS R1 1.0
BOUNDS
 UP X1 5.0
 MI X2
ENDATA
"""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mps")
        with open(path, "w") as f:
            f.write(text)
        p = read_mps(path)
    assert p.u[0] == 5.0
    assert np.isneginf(p.l[1])


def test_bounds_missing_value_is_clear_error():
    import tempfile, os

    from tpdlp import read_mps

    text = """NAME T
ROWS
 N COST
 G R1
COLUMNS
 X1 COST 1.0 R1 1.0
RHS
 RHS R1 1.0
BOUNDS
 UP BND X1
ENDATA
"""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.mps")
        with open(path, "w") as f:
            f.write(text)
        with pytest.raises(ValueError, match="BOUNDS"):
            read_mps(path)


def test_mesh_band_small_instance_solves():
    """mesh + matrix_format='band' routes through the sharded band path
    (flat partition, take+einsum); small instances fit one window."""
    import jax

    from tpdlp.shard import make_solver_mesh
    from tests.oracles import solve_oracle

    p = generate_feasible_lp(n=16, m_ineq=8, m_eq=4, seed=0)
    mesh = make_solver_mesh(jax.devices()[:1], shape=(1, 1))
    r = solve(p, SolverConfig(tol=1e-6, max_kkt=40_000), mesh=mesh,
              matrix_format="band")
    assert r.status == Status.SOLVED
    o = solve_oracle(p)
    assert abs(r.objective - o.fun) < 1e-3 * (1 + abs(o.fun))


def test_ell_stored_elems_matches_build():
    import scipy.sparse as sp

    from tpdlp.ops.blocked import BlockEllOp, ell_stored_elems

    rng = np.random.default_rng(4)
    K = sp.random(300, 500, density=0.02, random_state=rng, format="coo")
    est = ell_stored_elems(K)
    op = BlockEllOp.from_scipy(K.tocsr())
    real = op.fwd.tiles.size + op.bwd.tiles.size
    assert est == real
