"""Infeasibility-certificate tests on planted fixtures (SURVEY.md §4:
planted-infeasible via Farkas construction)."""

import pytest

from tpdlp import SolverConfig, Status, solve
from tpdlp.io.generator import (
    generate_feasible_lp,
    generate_infeasible_lp,
    generate_unbounded_lp,
)


def _cfg(infeas_tol):
    return SolverConfig(
        tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
        infeas_tol=infeas_tol,
    )


@pytest.mark.parametrize("tol", [1e-2, 1e-4, 1e-6])
def test_primal_infeasible_detected(tol):
    p = generate_infeasible_lp(seed=3)
    r = solve(p, _cfg(tol))
    assert r.status == Status.PRIMAL_INFEASIBLE


@pytest.mark.parametrize("tol", [1e-2, 1e-4])
def test_unbounded_detected_as_dual_infeasible(tol):
    # The reference's cone test cannot fire here (its c-sign conditions
    # exclude the descent-ray variable, enhancements.py:133-135); the
    # corrected recession-cone test detects it.
    p = generate_unbounded_lp(seed=1)
    r = solve(p, _cfg(tol))
    assert r.status == Status.DUAL_INFEASIBLE


def test_no_false_positive_on_feasible():
    # Normalised strict-ray certificates must not fire on a feasible LP even
    # as dx, dy -> 0 near convergence (the reference's unnormalised test
    # passes trivially there).
    p = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=5)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, infeasibility_detect=True,
        infeas_tol=1e-4, scaling="ruiz",
    )
    r = solve(p, cfg)
    assert r.status == Status.SOLVED


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_primal_infeasible_seeds(seed):
    p = generate_infeasible_lp(seed=seed)
    r = solve(p, _cfg(1e-4))
    assert r.status == Status.PRIMAL_INFEASIBLE


def test_normalized_certificate_families():
    """Both normalized families (iterate x/k and average 2*sum/(k(k+1)))
    fire on a clean unbounded ray; a feasible solve with them enabled still
    reaches SOLVED (experiments/InfeasibilityDetection3.py:339-382)."""
    import jax.numpy as jnp

    from tpdlp.solver.infeasibility import (
        normalized_average_certificates,
        normalized_iterate_certificates,
    )

    # Synthetic ray: x_k = k * d (exactly linear growth) => x/k and the
    # normalized average both converge to nonzero points.
    import numpy as np

    d = jnp.asarray(np.array([1.0, -0.5, 0.25]))
    k = jnp.int32(50)
    x_k = 50.0 * d
    x_sum = d * (50 * 51 / 2.0)  # sum_{i<=50} i*d
    zero = jnp.zeros(2)
    st = normalized_iterate_certificates(
        x_k, zero, 49.0 * d / 49.0, zero, k
    )[0]
    assert int(st) == int(Status.DUAL_INFEASIBLE)
    st2 = normalized_average_certificates(
        x_sum, jnp.zeros(2), x_k, zero, k
    )
    assert int(st2) == int(Status.DUAL_INFEASIBLE)

    # Feasible problem with the full certificate stack on: still solves.
    p = generate_feasible_lp(n=30, m_ineq=18, m_eq=6, seed=2)
    r = solve(
        p,
        SolverConfig(
            tol=1e-6, scaling="ruiz", adaptive=True,
            infeasibility_detect=True, normalized_certificates=True,
            normalized_tol_conv=1e-7,
        ),
    )
    assert r.status == Status.SOLVED, r.status_string


def test_certificates_fire_under_adaptive_pwu_at_scale():
    """Round-5: the production flag set (ruiz + adaptive + pwu) must
    still certify at suite scale.  Two fixes make this pass: the
    restart-WINDOW ray family (consecutive diffs are jittered by
    adaptive retry/accept stepsizes — a planted-unbounded LP went
    undetected for 28k adaptive iterations) and the omega clamp
    (cfg.omega_clamp: the pwu spiral blew the primal stepsize up ~3e5x
    on a planted-infeasible LP and destroyed the dual ray)."""
    from tpdlp.io.generator import generate_unbounded_lp

    full = SolverConfig(
        tol=1e-6, max_kkt=100_000, infeasibility_detect=True,
        scaling="ruiz", adaptive=True, primal_weight_update=True,
    )
    pu = generate_unbounded_lp(n=757, m_ineq=280, seed=1)
    assert solve(pu, full).status == Status.DUAL_INFEASIBLE
    pi = generate_infeasible_lp(n=757, m_eq=280, density=0.05, seed=1)
    assert solve(pi, full).status == Status.PRIMAL_INFEASIBLE


def test_omega_clamp_zero_restores_reference_behavior():
    """omega_clamp=0 disables the guard (exact reference update rule)."""
    p = generate_feasible_lp(n=40, m_ineq=25, m_eq=8, seed=5)
    cfg = SolverConfig(tol=1e-6, scaling="ruiz", adaptive=True,
                       primal_weight_update=True, omega_clamp=0.0)
    r = solve(p, cfg)
    assert r.status == Status.SOLVED
