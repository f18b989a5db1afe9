from tpdlp.presolve.reductions import presolve, postsolve, PostsolveData
from tpdlp.presolve.files import presolve_mps, postsolve_solution

__all__ = [
    "presolve",
    "postsolve",
    "PostsolveData",
    "presolve_mps",
    "postsolve_solution",
]
