from tpdlp.presolve.reductions import (
    presolve, postsolve, postsolve_dual, PostsolveData,
)
from tpdlp.presolve.files import (
    presolve_mps, postsolve_solution, postsolve_dual_solution,
)

__all__ = [
    "presolve",
    "postsolve",
    "postsolve_dual",
    "PostsolveData",
    "presolve_mps",
    "postsolve_solution",
    "postsolve_dual_solution",
]
