"""Sharded-solve tests on the 8-device virtual CPU mesh (SURVEY.md §4:
simulated-multihost CI so pod-slice code paths run without TPUs)."""

import jax
import numpy as np
import pytest

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.shard import make_solver_mesh
from tests.oracles import solve_oracle


def test_mesh_shapes():
    mesh = make_solver_mesh()
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"row", "col"}


@pytest.mark.parametrize("shape", [(2, 4), (1, 8), (8, 1)])
def test_sharded_solve_matches_oracle(shape):
    mesh = make_solver_mesh(shape=shape)
    # Dimensions deliberately NOT divisible by the mesh (exercise padding).
    problem = generate_feasible_lp(n=53, m_ineq=29, m_eq=10, seed=11)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    result = solve(problem, cfg, mesh=mesh)
    oracle = solve_oracle(problem)
    assert result.status == Status.SOLVED
    assert oracle.status == 0
    np.testing.assert_allclose(result.objective, oracle.fun, rtol=1e-3, atol=1e-3)
    assert result.x.shape == (problem.n,)
    assert result.y.shape == (problem.m,)


def test_sharded_equals_unsharded():
    mesh = make_solver_mesh(shape=(2, 4))
    problem = generate_feasible_lp(n=48, m_ineq=24, m_eq=8, seed=12)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000)
    r1 = solve(problem, cfg)
    r8 = solve(problem, cfg, mesh=mesh)
    # Same algorithm, same data — padding is exact, so iterate counts and
    # objectives agree tightly.
    assert r8.status == r1.status == Status.SOLVED
    np.testing.assert_allclose(r8.objective, r1.objective, rtol=1e-6)
    assert abs(r8.iterations - r1.iterations) <= 2


def test_sharded_with_all_features():
    mesh = make_solver_mesh(shape=(2, 4))
    problem = generate_feasible_lp(n=40, m_ineq=30, m_eq=6, seed=13)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, scaling="ruiz", adaptive=True,
        primal_weight_update=True, infeasibility_detect=True,
    )
    result = solve(problem, cfg, mesh=mesh)
    oracle = solve_oracle(problem)
    assert result.status == Status.SOLVED
    np.testing.assert_allclose(result.objective, oracle.fun, rtol=1e-3, atol=1e-3)
