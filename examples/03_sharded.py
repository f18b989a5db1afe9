"""Shard one LP across a device mesh (single LP too big for one chip).

On a pod slice this runs over real chips via ICI; without TPU hardware it
demonstrates the identical code path on a virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/03_sharded.py
"""

import jax

import tpdlp
from tpdlp.shard.mesh import make_solver_mesh

devices = jax.devices()
print(f"{len(devices)} device(s): {devices[0].platform}")

mesh = make_solver_mesh()  # ("row", "col") mesh over all devices
problem = tpdlp.generate_feasible_lp(n=1024, m_ineq=512, m_eq=128, seed=3)

config = tpdlp.SolverConfig(tol=1e-6, scaling="ruiz", adaptive=True)
result = tpdlp.solve(problem, config, mesh=mesh)

print(f"sharded over {mesh.shape}: {result.status_string}  "
      f"obj={result.objective:.6f}  k={result.iterations}")

# Same solve, single device — identical math, same answer.
single = tpdlp.solve(problem, config)
print(f"single device          : {single.status_string}  "
      f"obj={single.objective:.6f}  k={single.iterations}")
