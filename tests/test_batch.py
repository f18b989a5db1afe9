"""Batched (vmapped) multi-instance solve tests."""

import numpy as np
import pytest

from tpdlp import SolverConfig, Status, generate_feasible_lp
from tpdlp.batch import solve_batch
from tpdlp.io.generator import generate_infeasible_lp
from tests.oracles import solve_oracle


def test_batch_same_shape_matches_oracle():
    problems = [
        generate_feasible_lp(n=30, m_ineq=18, m_eq=6, seed=s)
        for s in range(4)
    ]
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    results = solve_batch(problems, cfg)
    for p, r in zip(problems, results):
        o = solve_oracle(p)
        assert o.status == 0
        assert r.status == Status.SOLVED, r.status_string
        np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3, atol=1e-3)


def test_batch_ragged_shapes():
    problems = [
        generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=1),
        generate_feasible_lp(n=35, m_ineq=20, m_eq=8, seed=2),
        generate_feasible_lp(n=28, m_ineq=0, m_eq=10, seed=3),
    ]
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    results = solve_batch(problems, cfg)
    for p, r in zip(problems, results):
        o = solve_oracle(p)
        assert r.status == Status.SOLVED, (p.name, r.status_string)
        np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3, atol=1e-3)
        assert r.x.shape == (p.n,)


def test_batch_matches_single_solve():
    from tpdlp import solve

    problems = [
        generate_feasible_lp(n=25, m_ineq=15, m_eq=5, seed=s)
        for s in (7, 8)
    ]
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000)
    batch = solve_batch(problems, cfg)
    for p, rb in zip(problems, batch):
        rs = solve(p, cfg)
        assert rb.status == rs.status == Status.SOLVED
        np.testing.assert_allclose(rb.objective, rs.objective, rtol=1e-6)
        # Same trajectory: iteration counts match exactly (padding-exact).
        assert rb.iterations == rs.iterations


def test_batch_mixed_feasible_infeasible():
    problems = [
        generate_feasible_lp(n=30, m_ineq=15, m_eq=5, seed=1),
        generate_infeasible_lp(seed=3),
    ]
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, infeasibility_detect=True, infeas_tol=1e-4
    )
    results = solve_batch(problems, cfg)
    assert results[0].status == Status.SOLVED
    assert results[1].status == Status.PRIMAL_INFEASIBLE


def test_batch_global_restart_sync():
    """The lockstep restart schedule solves to the same tolerance and
    objectives as the exact per-element schedule."""
    problems = [
        generate_feasible_lp(n=30, m_ineq=18, m_eq=6, seed=s)
        for s in range(4)
    ]
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    exact = solve_batch(problems, cfg, restart_sync="element")
    fast = solve_batch(problems, cfg, restart_sync="global")
    for p, re_, rf in zip(problems, exact, fast):
        assert rf.status == Status.SOLVED, (p.name, rf.status_string)
        np.testing.assert_allclose(rf.objective, re_.objective, rtol=1e-4)

    with pytest.raises(ValueError):
        solve_batch(problems, cfg, restart_sync="bogus")


def test_batch_compaction_preserves_results(monkeypatch):
    """Force the straggler-compaction path (gates patched to always fire)
    and check every instance's objective still maps back correctly."""
    import tpdlp.batch.vmapped as V

    monkeypatch.setattr(V, "_MIN_COMPACT", 2)
    monkeypatch.setattr(V, "_COMPACT_MIN_CHUNK_WALL", 0.0)

    # Wildly different difficulty: tiny easy instances + harder ones, so
    # the easy half finishes first and compaction triggers mid-solve.
    problems = [
        generate_feasible_lp(n=12, m_ineq=7, m_eq=2, seed=s)
        for s in range(6)
    ] + [
        generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=s)
        for s in range(4)
    ]
    cfg = SolverConfig(
        tol=1e-6, max_kkt=80_000, scaling="ruiz",
        chunk_kkt_init=64, chunk_kkt_max=256,  # many chunk boundaries
    )
    results = solve_batch(problems, cfg, restart_sync="global")
    for p, r in zip(problems, results):
        o = solve_oracle(p)
        assert r.status == Status.SOLVED, (p.name, r.status_string)
        np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3, atol=1e-3)
        assert r.x.shape == (p.n,)


def test_batch_halpern_scheme():
    problems = [
        generate_feasible_lp(n=25, m_ineq=15, m_eq=5, seed=s)
        for s in range(3)
    ]
    cfg = SolverConfig(tol=1e-6, scaling="ruiz", step_scheme="halpern")
    for sync in ("element", "global"):
        results = solve_batch(problems, cfg, restart_sync=sync)
        for p, r in zip(problems, results):
            o = solve_oracle(p)
            assert r.status == Status.SOLVED, (sync, p.name, r.status_string)
            np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3,
                                       atol=1e-3)
