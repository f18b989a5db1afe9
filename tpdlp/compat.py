"""Reference-compatible one-call entry points.

The reference exposes three MPS-path-in, tuple-out convenience solvers
(the L6 "Package API" layer):

- ``pdhg_solver(mps_path, ...)``       (reference: Packages/pdhg_solver.py:1-52)
- ``restarted_solver(mps_path, ...)``  (reference: Packages/pdhg_solver.py:54-105)
- ``pdlp_solver(mps_path, ...)``       (reference:
  Packages/PDLP_without_presolve_infeasibility.py:748-789)

This module provides the same call signatures and return tuples (numpy
arrays in place of torch tensors) on top of :func:`tpdlp.solve`, so a
reference user can switch imports without touching call sites:

    from tpdlp.compat import pdlp_solver
    x, obj, k, n, j = pdlp_solver("instance.mps", tol=1e-8)

Documented deviations from the reference implementations (never from
their signatures):

- tpdlp's solver core is restarted PDHG running entirely on-device;
  ``pdhg_solver`` (the reference's *plain*, restart-free PDHG,
  Packages/pdhg_torch_algorithm.py:54-169) is served by the restarted
  core with restart checks at the ``term_period`` cadence — termination
  semantics, tolerances and the returned triple are identical, the
  iterate path is at least as good.
- ``max_iter`` budgets are enforced in KKT passes (the reference's own
  work metric; one pass >= one iteration because restart checks and
  adaptive retries also count passes), so an iteration budget is never
  exceeded — a budget-limited run may therefore stop EARLIER than the
  reference's, never later.  Callers tuning ``max_iter`` as an exact
  iteration count should pass a proportionally larger value (roughly
  ``max_iter * 1.1`` covers the restart-check overhead at the default
  period).
- The reference prints the device banner and result block
  unconditionally in ``pdhg_solver`` (Packages/pdhg_solver.py:23,26,
  47-50) and gates nothing on verbosity; here ALL prints (banner and
  result block, in every entry) are gated on ``verbose`` so these
  functions are usable as libraries.  Pass ``verbose=True`` (the
  default) for reference-identical output.
"""

from __future__ import annotations

import numpy as np

from tpdlp.config import SolverConfig
from tpdlp.io.mps import read_mps
from tpdlp.solver.solve import solve


def _print_result(result, verbose: bool, with_restarts: bool,
                  with_kkt: bool) -> None:
    if not verbose:
        return
    print("Objective Value:", result.objective)
    print("Iterations:", result.iterations)
    if with_restarts:
        print("Restarts:", result.restarts)
    if with_kkt:
        print("KKT Passes:", result.kkt_passes)
    print("\nMinimizer (first 10 variables):")
    print(np.asarray(result.x)[:10])


def _device_banner(verbose: bool) -> None:
    if not verbose:
        return
    import jax

    dev = jax.devices()[0]
    print(f"tpdlp is using JAX device: {dev}")


def pdhg_solver(mps_file_path, max_iter=10000, tol=1e-4, term_period=1000,
                verbose=True):
    """Plain-PDHG convenience entry (reference Packages/pdhg_solver.py:1).

    Returns ``(minimizer, objective_value, iterations)``.
    """
    _device_banner(verbose)
    problem = read_mps(mps_file_path)
    cfg = SolverConfig(
        tol=tol,
        max_kkt=max_iter,
        restart_period=term_period,
        verbose=verbose,
    )
    result = solve(problem, cfg)
    _print_result(result, verbose, with_restarts=False, with_kkt=False)
    return np.asarray(result.x), result.objective, result.iterations


def restarted_solver(mps_file_path, tol=1e-4, restart_period=40,
                     verbose=True, max_iter=100_000):
    """Restarted-PDHG convenience entry (reference
    Packages/pdhg_solver.py:54).

    Returns ``(minimizer, objective_value, iterations, restarts)``.
    """
    _device_banner(verbose)
    problem = read_mps(mps_file_path)
    cfg = SolverConfig(
        tol=tol,
        max_kkt=max_iter,
        restart_period=restart_period,
        verbose=verbose,
    )
    result = solve(problem, cfg)
    _print_result(result, verbose, with_restarts=True, with_kkt=False)
    return (np.asarray(result.x), result.objective, result.iterations,
            result.restarts)


def pdlp_solver(mps_file_path, tol=1e-4, restart_period=40, verbose=True,
                max_iter=1_000_000, precondition=True, adaptive_step=True,
                primal_update=True):
    """Full-PDLP convenience entry (reference
    Packages/PDLP_without_presolve_infeasibility.py:748).

    Returns ``(minimizer, objective_value, iterations, restarts,
    kkt_passes)``.
    """
    _device_banner(verbose)
    problem = read_mps(mps_file_path)
    cfg = SolverConfig(
        tol=tol,
        max_kkt=max_iter,
        restart_period=restart_period,
        scaling="ruiz" if precondition else "none",
        adaptive=adaptive_step,
        primal_weight_update=primal_update,
        verbose=verbose,
    )
    result = solve(problem, cfg)
    _print_result(result, verbose, with_restarts=True, with_kkt=True)
    return (np.asarray(result.x), result.objective, result.iterations,
            result.restarts, result.kkt_passes)


__all__ = ["pdhg_solver", "restarted_solver", "pdlp_solver"]
