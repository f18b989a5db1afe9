"""Solve a fleet of LPs as ONE device program (vmapped batch).

Two fleet shapes:
- perturbed fleet: one constraint matrix, many cost vectors
  (shared_operator="auto" shares ONE operator + scaling + power
  iteration across the batch);
- distinct fleet: different matrices, padded and stacked (dense, or the
  band-slab layout for banded instances).

Usage:  python examples/02_fleet.py
"""

import copy

import numpy as np

import tpdlp
from tpdlp.batch import solve_batch

base = tpdlp.generate_feasible_lp(n=120, m_ineq=70, m_eq=20, seed=0)

# --- perturbed fleet: same K, jittered costs -------------------------
rng = np.random.default_rng(7)
fleet = []
for _ in range(32):
    p = copy.deepcopy(base)
    p.c = p.c * (1.0 + 0.02 * rng.standard_normal(p.c.shape))
    fleet.append(p)

cfg = tpdlp.SolverConfig(tol=1e-6, scaling="ruiz", adaptive=True)
results = solve_batch(fleet, cfg, restart_sync="global")
solved = sum(r.status_string == "Solved" for r in results)
objs = [r.objective for r in results]
print(f"perturbed fleet: {solved}/{len(results)} solved, "
      f"objective range [{min(objs):.4f}, {max(objs):.4f}]")

# --- distinct banded fleet: stacked band-slab layout -----------------
banded = [
    tpdlp.generate_banded_lp(n=256, m_ineq=128, m_eq=64, bandwidth=9,
                             seed=s)
    for s in range(4)
]
results = solve_batch(banded, cfg, matrix_format="band",
                      shared_operator=False)
for p, r in zip(banded, results):
    print(f"{p.name}: {r.status_string}  obj={r.objective:.4f}  "
          f"k={r.iterations}")
