"""Tight-tolerance unstructured-sparse (block-ELL) soundness guard.

Round-3 verdict weak #5 / next #6: block-ELL has no exact-fp32 product
twin (ops/blocked.py "Precision caveat"), so on a reduced-precision-MXU
backend a direct fp32 `matrix_format="sparse"` solve below tol=1e-4
would certify termination against ~1e-5-noisy products.  solve() must
(a) REROUTE the default path (dtype=None) through iterative refinement,
whose fp64 host residuals are the judge, and (b) WARN when the caller
explicitly forces fp32 past the envelope.

The suite runs on XLA CPU (exact fp32 dots), so the backend predicate
`_mxu_noisy` is monkeypatched to simulate the accelerator.
"""

import warnings

import jax.numpy as jnp
import pytest

from importlib import import_module

from tpdlp import SolverConfig, Status, solve

# `import tpdlp.solver.solve as m` resolves to the FUNCTION (the package
# re-exports `solve`, shadowing the submodule attribute); go via the
# module registry.
solve_mod = import_module("tpdlp.solver.solve")
from tpdlp.io.generator import generate_feasible_lp


@pytest.fixture()
def noisy_backend(monkeypatch):
    monkeypatch.setattr(solve_mod, "_mxu_noisy", lambda: True)


def _problem():
    return generate_feasible_lp(n=40, m_ineq=25, m_eq=10, seed=3,
                                density=0.3)


def test_explicit_fp32_sparse_tight_tol_warns(noisy_backend):
    with pytest.warns(UserWarning, match="block-ELL"):
        solve(
            _problem(),
            SolverConfig(tol=1e-5, max_kkt=5000),
            dtype=jnp.float32,
            matrix_format="sparse",
        )


def test_sound_tolerance_does_not_warn(noisy_backend):
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        solve(
            _problem(),
            SolverConfig(tol=1e-4, max_kkt=20000),
            dtype=jnp.float32,
            matrix_format="sparse",
        )


def test_dense_exact_path_does_not_warn(noisy_backend):
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        solve(
            _problem(),
            SolverConfig(tol=1e-5, max_kkt=50000),
            dtype=jnp.float32,
            matrix_format="dense",
        )


def test_default_path_reroutes_through_refinement(
    noisy_backend, monkeypatch
):
    """dtype=None + sparse + tol<1e-4 on a noisy backend must escalate
    (refinement judges with fp64 host residuals) instead of warning —
    even though tol is ABOVE escalation_tol, where dense would solve
    directly."""
    monkeypatch.setattr(solve_mod, "default_dtype", lambda: jnp.float32)
    calls = {}
    import tpdlp.solver.refine as refine_mod

    real = refine_mod.solve_refined

    def spy(problem, cfg, **kw):
        calls["refined"] = True
        return real(problem, cfg, **kw)

    monkeypatch.setattr(refine_mod, "solve_refined", spy)
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        r = solve(
            _problem(),
            SolverConfig(tol=1e-5, max_kkt=100_000),
            matrix_format="sparse",
        )
    assert calls.get("refined") is True
    assert r.status == Status.SOLVED
