"""High-accuracy convergence battery (opt-in: pytest -m slow).

Sweeps the whole synthetic benchmark suite to 1e-8 relative KKT on the
CPU reference-precision backend and cross-checks every objective against
the HiGHS oracle — the SURVEY §4 "Netlib full set at 1e-8" analog for the
sets available in this image.  Runs all solver schemes.
"""

import numpy as np
import pytest

from tpdlp import SolverConfig, Status, solve
from tpdlp.bench.suite import build_suite
from tests.oracles import solve_oracle

SUITE = {p.name: p for p in build_suite(("small", "medium"))}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(SUITE))
@pytest.mark.parametrize(
    "scheme,adaptive",
    [("vanilla", True), ("vanilla", False), ("halpern", False)],
)
def test_suite_to_1e8_vs_oracle(name, scheme, adaptive):
    p = SUITE[name]
    cfg = SolverConfig(
        tol=1e-8, max_kkt=500_000, scaling="ruiz",
        primal_weight_update=True, adaptive=adaptive, step_scheme=scheme,
        time_limit=900,
    )
    r = solve(p, cfg)
    oracle = solve_oracle(p)
    assert oracle.status == 0
    assert r.status == Status.SOLVED, (name, scheme, r.status_string)
    rel = abs(r.objective - oracle.fun) / (1.0 + abs(oracle.fun))
    assert rel < 1e-6, (name, scheme, rel)
    # The reported point respects its box bounds.
    assert np.all(r.x >= p.l - 1e-9 * (1 + np.abs(np.where(
        np.isfinite(p.l), p.l, 0.0))))
    assert np.all(r.x <= p.u + 1e-9 * (1 + np.abs(np.where(
        np.isfinite(p.u), p.u, 0.0))))


@pytest.mark.slow
@pytest.mark.parametrize("seed", [3, 17, 42, 99, 123])
def test_random_instances_to_1e8(seed):
    """Random planted-feasible instances at 1e-8 under the default
    (auto-escalating) configuration, objectives vs HiGHS."""
    from tpdlp import generate_feasible_lp

    p = generate_feasible_lp(n=150, m_ineq=90, m_eq=30, seed=seed)
    cfg = SolverConfig(
        tol=1e-8, max_kkt=500_000, scaling="ruiz",
        primal_weight_update=True, time_limit=900,
    )
    r = solve(p, cfg)
    oracle = solve_oracle(p)
    assert r.status == Status.SOLVED, (seed, r.status_string)
    rel = abs(r.objective - oracle.fun) / (1.0 + abs(oracle.fun))
    assert rel < 1e-6, (seed, rel)
