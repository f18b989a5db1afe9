"""tpdlp — a TPU-native restarted-PDHG linear-programming solver.

A from-scratch JAX/XLA/Pallas implementation of the restarted Primal-Dual
Hybrid Gradient (PDLP) algorithm for general linear programs in the standard
form used by the reference torchPDLP (reference: PDLP/util.py:76-84):

    minimize    c'x
    subject to  G x >= h     (m_ineq inequality rows)
                A x  = b     (m_eq equality rows)
                l <= x <= u  (box bounds, entries may be +-inf)

with G and A stacked as K = [G; A], q = [h; b].

Unlike the reference (a host-driven Python loop issuing torch kernels), the
entire restarted iteration — steps, averaging, restart decisions, KKT
residuals, termination, and infeasibility certificates — runs on-device
inside a single `lax.while_loop`, with host synchronisation only at coarse
chunk boundaries (for wall-clock limits).  The SpMV pair K x / K'y is the
only O(nnz) work per iteration: the loop carry holds K x and K'y so that
adaptive stepsizes, restart metrics and infeasibility certificates reuse
them instead of issuing extra SpMVs.
"""

import os as _os

import jax as _jax

# LP solving at 1e-8 relative KKT tolerance requires float64 accumulation to
# be *available* (array dtypes remain configurable; TPU iterates in fp32 by
# default).  Enable once at import, before any tracing happens.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: on remote-tunnel TPU backends a cold compile
# of the solver pipeline costs tens of seconds; the disk cache brings repeat
# startups to ~4 s.  Respect an explicit user setting (flag or env var).
if (
    _jax.config.jax_compilation_cache_dir is None
    and "JAX_COMPILATION_CACHE_DIR" not in _os.environ
):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(
            _os.environ.get(
                "XDG_CACHE_HOME",
                _os.path.join(_os.path.expanduser("~"), ".cache"),
            ),
            "tpdlp",
            "jax",
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tpdlp.config import SolverConfig, Status
from tpdlp.problem import LPProblem
from tpdlp.solver.solve import solve, SolveResult
from tpdlp.batch.vmapped import solve_batch
from tpdlp.io.mps import read_mps, mps_to_standard_form
from tpdlp.io.generator import (
    generate_banded_lp,
    generate_feasible_lp,
    generate_infeasible_lp,
    generate_unbounded_lp,
)
from tpdlp.io.writer import write_mps
from tpdlp.timer import Timer, profile_trace
from tpdlp.compat import pdhg_solver, restarted_solver, pdlp_solver

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "Status",
    "LPProblem",
    "solve",
    "solve_batch",
    "SolveResult",
    "read_mps",
    "mps_to_standard_form",
    "write_mps",
    "generate_banded_lp",
    "generate_feasible_lp",
    "generate_infeasible_lp",
    "generate_unbounded_lp",
    "Timer",
    "profile_trace",
]
