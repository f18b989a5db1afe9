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


def _perturbed_fleet(base, B, seed=0, perturb_q=True):
    import dataclasses

    rng = np.random.default_rng(seed)
    fleet = []
    for _ in range(B):
        kw = {"c": base.c * (1 + 0.1 * rng.standard_normal(base.n))}
        if perturb_q:
            kw["q"] = base.q + 0.05 * rng.standard_normal(base.m)
        fleet.append(dataclasses.replace(base, **kw))
    return fleet


def test_batch_shared_operator_matches_dense_and_oracle():
    """Perturbed fleet (same K): the shared-operator path must give the
    SAME trajectories as the per-element dense stack (one operator + the
    same scaling diagonals => identical math), at a fraction of the HBM."""
    base = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=3,
                                density=0.3)
    fleet = _perturbed_fleet(base, 5)
    cfg = SolverConfig(tol=1e-6, max_kkt=100_000, scaling="ruiz")
    rs = solve_batch(fleet, cfg, shared_operator="auto")
    rd = solve_batch(fleet, cfg, shared_operator=False)
    for p, a, b in zip(fleet, rs, rd):
        o = solve_oracle(p)
        assert a.status == Status.SOLVED
        np.testing.assert_allclose(a.objective, o.fun, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(a.objective, b.objective, rtol=1e-9)
        assert a.iterations == b.iterations  # same math, same trajectory


@pytest.mark.parametrize("fmt", ["sparse", "auto"])
def test_batch_shared_operator_sparse_layouts(fmt):
    base = generate_feasible_lp(n=48, m_ineq=30, m_eq=10, seed=4,
                                density=0.25)
    fleet = _perturbed_fleet(base, 4, seed=1)
    cfg = SolverConfig(tol=1e-6, max_kkt=100_000, scaling="ruiz")
    rs = solve_batch(fleet, cfg, matrix_format=fmt)
    for p, r in zip(fleet, rs):
        o = solve_oracle(p)
        assert r.status == Status.SOLVED
        np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("sync", ["element", "global"])
def test_batch_shared_operator_band_fleet(sync):
    """Band-layout fleet: one band operator shared across the batch
    (verdict r2 item 6 — a band fleet could not use the band layout at
    all under the dense-only stack)."""
    from tpdlp import generate_banded_lp

    base = generate_banded_lp(n=256, m_ineq=128, m_eq=64, bandwidth=9,
                              seed=7)
    fleet = _perturbed_fleet(base, 4, seed=2, perturb_q=False)
    cfg = SolverConfig(tol=1e-6, max_kkt=100_000, scaling="ruiz")
    rs = solve_batch(fleet, cfg, matrix_format="band", restart_sync=sync)
    for p, r in zip(fleet, rs):
        o = solve_oracle(p)
        assert r.status == Status.SOLVED
        np.testing.assert_allclose(r.objective, o.fun, rtol=5e-3, atol=5e-3)


def test_batch_shared_operator_validation():
    problems = [
        generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=s)
        for s in range(2)
    ]
    with pytest.raises(ValueError, match="constraint"):
        solve_batch(problems, SolverConfig(tol=1e-4),
                    shared_operator=True)
    with pytest.raises(ValueError, match="distinct-K"):
        solve_batch(problems, SolverConfig(tol=1e-4),
                    matrix_format="sparse")


def test_batch_distinct_band_fleet_matches_single_solves():
    """DISTINCT banded matrices as one stacked band-slab fleet (beyond
    the shared-operator case: each element has its own K)."""
    from tpdlp import generate_banded_lp, solve

    problems = [
        generate_banded_lp(n=256, m_ineq=128, m_eq=64, bandwidth=9,
                           seed=s)
        for s in (1, 2, 3)
    ]
    cfg = SolverConfig(tol=1e-6, max_kkt=100_000, scaling="ruiz")
    batch = solve_batch(problems, cfg, matrix_format="band",
                        shared_operator=False)
    for p, rb in zip(problems, batch):
        o = solve_oracle(p)
        assert rb.status == Status.SOLVED, rb.status_string
        np.testing.assert_allclose(rb.objective, o.fun, rtol=1e-3,
                                   atol=1e-3)
        rs = solve(p, cfg, matrix_format="band")
        np.testing.assert_allclose(rb.objective, rs.objective, rtol=1e-5)


def test_batch_distinct_band_fleet_ragged_shapes():
    """Smaller instances pad into the common slab stack exactly."""
    from tpdlp import generate_banded_lp

    problems = [
        generate_banded_lp(n=256, m_ineq=128, m_eq=64, bandwidth=9,
                           seed=4),
        generate_banded_lp(n=192, m_ineq=96, m_eq=48, bandwidth=7,
                           seed=5),
    ]
    cfg = SolverConfig(tol=1e-6, max_kkt=100_000, scaling="ruiz")
    batch = solve_batch(problems, cfg, matrix_format="band",
                        shared_operator=False)
    for p, rb in zip(problems, batch):
        o = solve_oracle(p)
        assert rb.status == Status.SOLVED, rb.status_string
        np.testing.assert_allclose(rb.objective, o.fun, rtol=1e-3,
                                   atol=1e-3)
        assert rb.x.shape == (p.n,)


def test_batch_distinct_auto_picks_band(monkeypatch):
    """matrix_format='auto' on a distinct-K banded fleet routes through
    the stacked band-slab path (and never errors)."""
    from tpdlp import generate_banded_lp
    from tpdlp.batch import vmapped

    calls = []
    real = vmapped._batch_init_band

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(vmapped, "_batch_init_band", spy)
    # Big enough that the slab stack is materially smaller than dense
    # (tiny instances pad groups to multiples of 8 and auto stays dense).
    problems = [
        generate_banded_lp(n=2048, m_ineq=1024, m_eq=512, bandwidth=33,
                           seed=s)
        for s in (6, 7)
    ]
    # Routing is the assertion, not convergence: tiny budget keeps it fast.
    cfg = SolverConfig(tol=1e-6, max_kkt=400, scaling="ruiz")
    rs = solve_batch(problems, cfg, matrix_format="auto",
                     shared_operator=False)
    assert calls, "auto did not route through the band stack"
    assert all(
        r.status in (Status.SOLVED, Status.KKT_LIMIT) for r in rs
    )


def test_batch_distinct_auto_falls_back_to_dense():
    """'auto' on an unbanded distinct-K fleet silently uses dense."""
    problems = [
        generate_feasible_lp(n=2600, m_ineq=10, m_eq=4, seed=s,
                             density=0.5)
        for s in (3, 4)
    ]
    cfg = SolverConfig(tol=1e-4, max_kkt=60_000, scaling="ruiz")
    rs = solve_batch(problems, cfg, matrix_format="auto",
                     shared_operator=False)
    for p, r in zip(problems, rs):
        o = solve_oracle(p)
        assert r.status == Status.SOLVED, r.status_string
        np.testing.assert_allclose(r.objective, o.fun, rtol=1e-3,
                                   atol=1e-3)


def test_batch_distinct_band_rejects_unbanded():
    # Random dense rows over 2600 columns: some 128-row group's window
    # exceeds BandOp.MAX_WINDOW, so the layout build must bail with a
    # clear error naming the instance (before any device work).
    problems = [
        generate_feasible_lp(n=2600, m_ineq=40, m_eq=8, seed=s,
                             density=0.5)
        for s in (1, 2)
    ]
    with pytest.raises(ValueError, match="band-like"):
        solve_batch(problems, SolverConfig(tol=1e-4),
                    matrix_format="band", shared_operator=False)
