"""Iterative refinement (solver/refine.py): 1e-8 .. 1e-12 from pure-fp32
device solves.

The inner solves run in jnp.float32 EXPLICITLY (regardless of platform),
so these CPU tests exercise exactly the TPU configuration: fp32 device
iterations + fp64 host outer loop.  fp32 PDHG alone stalls near 1e-7
relative KKT, so every tolerance below that certifies the refinement
machinery, not the inner solver.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from tpdlp import SolverConfig, Status, solve
from tpdlp.io.generator import generate_feasible_lp
from tpdlp.solver.refine import host_residuals, solve_refined
from tests.oracles import solve_oracle


def _K64(p):
    return (p.K.tocsr().astype(np.float64) if sp.issparse(p.K)
            else np.asarray(p.K, dtype=np.float64))


def _assert_certified(p, r, tol):
    """Independently recheck the reference termination criteria in fp64."""
    res = host_residuals(
        _K64(p), np.asarray(p.c, float), np.asarray(p.q, float),
        np.asarray(p.l, float), np.asarray(p.u, float), p.m_ineq,
        np.asarray(r.x, float), np.asarray(r.y, float),
    )
    q_norm = float(np.linalg.norm(p.q))
    c_norm = float(np.linalg.norm(p.c))
    assert res.primal_res <= tol * (1 + q_norm)
    assert res.dual_res <= tol * (1 + c_norm)
    assert abs(res.gap) <= tol * (
        1 + abs(res.prim_obj) + abs(res.adjusted_dual)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_refine_reaches_1e10_from_fp32(seed):
    p = generate_feasible_lp(n=45, m_ineq=30, m_eq=10, seed=seed)
    tol = 1e-10
    cfg = SolverConfig(tol=tol, max_kkt=400_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)
    o = solve_oracle(p)
    assert abs(r.objective - o.fun) / (1 + abs(o.fun)) < 1e-9


def test_refine_far_below_fp32_floor():
    # 1e-12: four orders below what fp32 iterates can express — only the
    # zoomed-frame corrections can get here.
    p = generate_feasible_lp(n=30, m_ineq=20, m_eq=6, seed=7)
    tol = 1e-12
    cfg = SolverConfig(tol=tol, max_kkt=600_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)


def test_refine_afiro_to_published_optimum():
    from tpdlp.io import netlib

    p = netlib.load("afiro", mirrors=[])
    tol = 1e-10
    cfg = SolverConfig(tol=tol, max_kkt=600_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)
    assert r.objective == pytest.approx(-464.7531428571, abs=5e-7)


def test_refine_with_infinite_and_free_bounds():
    p = generate_feasible_lp(n=40, m_ineq=28, m_eq=8, seed=3)
    p.u[::3] = np.inf
    p.l[1::5] = -np.inf
    p.l[2] = -np.inf
    p.u[2] = np.inf  # fully free variable
    o = solve_oracle(p)
    assert o.status == 0
    tol = 1e-9
    cfg = SolverConfig(tol=tol, max_kkt=400_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)
    assert abs(r.objective - o.fun) / (1 + abs(o.fun)) < 1e-8


def test_refine_kkt_budget_exhaustion_is_honest():
    p = generate_feasible_lp(n=45, m_ineq=30, m_eq=10, seed=0)
    cfg = SolverConfig(tol=1e-10, max_kkt=900, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status in (Status.KKT_LIMIT, Status.TIME_LIMIT)
    assert r.kkt_passes <= 900 + 2100  # budget + one in-flight chunk


def test_refine_op_cache_reused_across_rounds():
    p = generate_feasible_lp(n=30, m_ineq=20, m_eq=6, seed=1)
    cache = {}
    # Polish off: this test exercises the correction-round operator
    # cache, and the active-set polish would certify 1e-9 straight from
    # stage 1 (no correction solve would ever run).
    cfg = SolverConfig(tol=1e-9, max_kkt=400_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True,
                       refine_polish=False)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0, op_cache=cache)
    assert r.status == Status.SOLVED
    # Two fp32 operators — the stage-1 matrix and the slack-form
    # correction matrix — each built once and shared by every round.
    assert len(cache) == 2


def test_public_solve_escalates_via_refinement(monkeypatch):
    # On an accelerator default_dtype() is fp32 and tol<escalation_tol
    # routes through solve_refined; emulate that default on CPU.
    import importlib

    import jax.numpy as jnp

    solve_mod = importlib.import_module("tpdlp.solver.solve")
    monkeypatch.setattr(solve_mod, "default_dtype", lambda: jnp.float32)
    p = generate_feasible_lp(n=30, m_ineq=20, m_eq=6, seed=2)
    tol = 1e-9
    r = solve(
        p,
        SolverConfig(tol=tol, max_kkt=400_000, scaling="ruiz",
                     adaptive=True, abs_gap_termination=True,
                     escalation_mode="refine"),
    )
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)


def test_refine_matches_fp64_tail_objective(monkeypatch):
    """The two escalation modes must agree (same problem, same answer)."""
    import importlib

    import jax.numpy as jnp

    solve_mod = importlib.import_module("tpdlp.solver.solve")
    monkeypatch.setattr(solve_mod, "default_dtype", lambda: jnp.float32)
    p = generate_feasible_lp(n=25, m_ineq=16, m_eq=5, seed=4)
    base = SolverConfig(tol=1e-8, max_kkt=400_000, scaling="ruiz",
                        adaptive=True, abs_gap_termination=True)
    r_ref = solve(p, base.replace(escalation_mode="refine"))
    r_f64 = solve(p, base.replace(escalation_mode="fp64_tail"))
    assert r_ref.status == r_f64.status == Status.SOLVED
    assert r_ref.objective == pytest.approx(r_f64.objective, rel=1e-7)


@pytest.mark.parametrize("seed", [0, 3])
def test_refine_mixed_bounds_dual_residual_content(seed):
    """Round-3 verdict item 4: on instances with infinite/one-sided
    bounds the dual residual is NOT identically zero (lambda is a strict
    cone projection), so termination condition 2 has actual content —
    the refinement must drive a genuinely nonzero dual_res below
    tol*(1+||c||) rather than inherit a vacuous 0."""
    p = generate_feasible_lp(n=50, m_ineq=30, m_eq=10, seed=seed,
                             bounds="mixed")
    tol = 1e-9
    cfg = SolverConfig(tol=tol, max_kkt=400_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)
    # The instance genuinely exercises condition 2: a PERTURBED dual has
    # nonzero stationarity residual (i.e. the zero in r.dual_res is
    # earned, not structural).
    y_pert = np.asarray(r.y, float) + 1e-3
    res = host_residuals(
        _K64(p), np.asarray(p.c, float), np.asarray(p.q, float),
        np.asarray(p.l, float), np.asarray(p.u, float), p.m_ineq,
        np.asarray(r.x, float), y_pert,
    )
    assert res.dual_res > 0.0


def test_refine_escapes_feasible_suboptimal_freeze():
    """A feasibility-monotone primal fold guard freezes the incumbent at
    the first machine-feasible point even when its OBJECTIVE is far from
    optimal (measured on mittelmann-m: pres 1.8e-13, objective 2.7e-3
    high, dual already optimal).  Value-improving folds that stay inside
    the feasibility criterion must be accepted, so tight-tolerance
    refinement converges in OBJECTIVE too."""
    p = generate_feasible_lp(n=60, m_ineq=35, m_eq=12, seed=11)
    tol = 1e-10
    cfg = SolverConfig(tol=tol, max_kkt=400_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    assert r.status == Status.SOLVED, r.status_string
    o = solve_oracle(p)
    assert abs(r.objective - o.fun) / (1 + abs(o.fun)) < 1e-8
