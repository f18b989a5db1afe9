"""1e-8 and beyond on accelerators without fp64 device programs.

TPU MXUs have no native fp64.  With the default config, `solve` at
tol < 1e-6 on an fp32 backend runs precision escalation automatically:
an fp32 coarse solve, then iterative-refinement rounds (fp32 device
programs over zoomed correction LPs, fp64 outer loop on the host).
On CPU the default dtype is already fp64, so this example forces the
refinement machinery explicitly to show it.

Usage:  python examples/04_high_accuracy.py
"""

import tpdlp
from tpdlp.solver.refine import solve_refined
from tpdlp.solver.solve import solve

problem = tpdlp.generate_feasible_lp(n=400, m_ineq=200, m_eq=80, seed=1)
config = tpdlp.SolverConfig(
    tol=1e-10, scaling="ruiz", adaptive=True, primal_weight_update=True,
)

# On a TPU backend this is just: tpdlp.solve(problem, config)
result = solve_refined(problem, config, solve_fn=solve)

print(f"status    : {result.status_string}")
print(f"objective : {result.objective:.12g}")
print(f"residuals : primal {result.primal_res:.2e}  "
      f"dual {result.dual_res:.2e}  gap {result.gap:.2e}")
print("(every device program ran in pure fp32)")
