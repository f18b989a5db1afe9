"""Solve one MPS file, reference-style (torchPDLP PDLP/main.py parity).

Usage:  python examples/01_solve_mps.py [path/to/instance.mps]

Defaults to the vendored authentic Netlib afiro and checks the solved
objective against the published optimum.
"""

import sys

import tpdlp
from tpdlp.io import netlib

if len(sys.argv) > 1:
    problem = tpdlp.read_mps(sys.argv[1])
else:
    problem = netlib.load("afiro", mirrors=[])  # vendored, offline-safe

config = tpdlp.SolverConfig(
    tol=1e-8,                  # relative KKT tolerance
    scaling="ruiz",            # --precondition
    adaptive=True,             # --adaptive_stepsize
    primal_weight_update=True,  # --primal_weight_update
    infeasibility_detect=True,  # --infeasibility_detect
)
result = tpdlp.solve(problem, config)

print(f"status     : {result.status_string}")
print(f"objective  : {result.objective:.10g}")
print(f"iterations : {result.iterations}  (restarts {result.restarts}, "
      f"KKT passes {result.kkt_passes})")
print(f"residuals  : primal {result.primal_res:.2e}  "
      f"dual {result.dual_res:.2e}  gap {result.gap:.2e}")

if getattr(problem, "known_objective", None) is not None:
    netlib.verify_objective(problem.name, result.objective,
                            obj_offset=problem.obj_offset)
    print(f"matches the published optimum {problem.known_objective}")
