"""Reference-compat one-call API (tpdlp/compat.py).

The reference's Packages layer exposes pdhg_solver / restarted_solver /
pdlp_solver as MPS-path-in, tuple-out entries (Packages/pdhg_solver.py:1,54;
Packages/PDLP_without_presolve_infeasibility.py:748).  These tests assert
the tpdlp twins keep the exact signatures and return arities, and that the
solutions they hand back match the oracle optimum.
"""

import inspect

import numpy as np
import pytest

from tests.oracles import solve_oracle
from tpdlp.compat import pdhg_solver, pdlp_solver, restarted_solver
from tpdlp.io.generator import generate_feasible_lp
from tpdlp.io.mps import read_mps
from tpdlp.io.writer import write_mps


@pytest.fixture(scope="module")
def mps_path(tmp_path_factory):
    problem = generate_feasible_lp(n=25, m_ineq=12, m_eq=6, seed=3)
    path = tmp_path_factory.mktemp("compat") / "compat.mps"
    write_mps(problem, path)
    return str(path)


def _oracle_objective(mps_path):
    res = solve_oracle(read_mps(mps_path))
    assert res.status == 0
    return res.fun


def test_signatures_match_reference():
    # Exact parameter names, order and defaults of the reference entries.
    assert list(inspect.signature(pdhg_solver).parameters) == [
        "mps_file_path", "max_iter", "tol", "term_period", "verbose",
    ]
    assert list(inspect.signature(restarted_solver).parameters) == [
        "mps_file_path", "tol", "restart_period", "verbose", "max_iter",
    ]
    assert list(inspect.signature(pdlp_solver).parameters) == [
        "mps_file_path", "tol", "restart_period", "verbose", "max_iter",
        "precondition", "adaptive_step", "primal_update",
    ]
    defaults = {
        k: v.default
        for k, v in inspect.signature(pdlp_solver).parameters.items()
    }
    assert defaults["tol"] == 1e-4
    assert defaults["restart_period"] == 40
    assert defaults["max_iter"] == 1_000_000
    assert defaults["precondition"] and defaults["adaptive_step"]
    assert defaults["primal_update"]


def test_pdhg_solver_triple(mps_path):
    x, obj, k = pdhg_solver(mps_path, tol=1e-4, verbose=False)
    oracle = _oracle_objective(mps_path)
    assert isinstance(x, np.ndarray)
    assert abs(obj - oracle) <= 1e-3 * (1 + abs(oracle))
    assert k > 0


def test_restarted_solver_quadruple(mps_path):
    x, obj, k, n = restarted_solver(mps_path, tol=1e-4, verbose=False)
    oracle = _oracle_objective(mps_path)
    assert abs(obj - oracle) <= 1e-3 * (1 + abs(oracle))
    assert k > 0 and n >= 0


def test_pdlp_solver_quintuple(mps_path, capsys):
    x, obj, k, n, j = pdlp_solver(mps_path, tol=1e-6, max_iter=100_000)
    oracle = _oracle_objective(mps_path)
    assert abs(obj - oracle) <= 1e-4 * (1 + abs(oracle))
    assert j >= k > 0
    out = capsys.readouterr().out
    # Reference-style verbose report (pdhg_solver.py:44-50).
    assert "Objective Value:" in out
    assert "KKT Passes:" in out
    assert "Minimizer (first 10 variables):" in out


def test_pdlp_solver_flags_off(mps_path):
    x, obj, k, n, j = pdlp_solver(
        mps_path, tol=1e-4, verbose=False, precondition=False,
        adaptive_step=False, primal_update=False,
    )
    oracle = _oracle_objective(mps_path)
    assert abs(obj - oracle) <= 1e-3 * (1 + abs(oracle))
