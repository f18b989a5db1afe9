from tpdlp.io.mps import read_mps, mps_to_standard_form
from tpdlp.io.writer import write_mps
from tpdlp.io.generator import generate_feasible_lp, generate_infeasible_lp

__all__ = [
    "read_mps",
    "mps_to_standard_form",
    "write_mps",
    "generate_feasible_lp",
    "generate_infeasible_lp",
]
