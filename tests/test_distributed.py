"""Multi-process distributed backend: REAL multi-process semantics.

Spawns two coordinator-linked processes (jax.distributed), each hosting 4
virtual CPU devices; `tpdlp.shard.init_distributed` builds the global
8-device ("row", "col") mesh and a single sharded solve runs across both
processes — result fetch goes through the process_allgather path
(`solve.py::_fetch_bundle`).  This is the simulated form of the SURVEY
§2.3 multi-host backend row (on a real pod slice the same code spans
hosts over ICI/DCN).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
proc_id = int(sys.argv[1]); num = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.shard import init_distributed

mesh = init_distributed(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num,
    process_id=proc_id,
)
assert jax.process_count() == num, jax.process_count()
assert mesh.size == 4 * num, dict(mesh.shape)

problem = generate_feasible_lp(n=45, m_ineq=26, m_eq=9, seed=0)
cfg = SolverConfig(tol=1e-5, max_kkt=40_000, scaling="ruiz", adaptive=True)
r = solve(problem, cfg, mesh=mesh, matrix_format="dense")
assert r.status == Status.SOLVED, r.status_string
# An UNSHARDED solve inside the distributed session must also work: its
# arrays are fully addressable and must NOT be allgathered.
p2 = generate_feasible_lp(n=20, m_ineq=12, m_eq=4, seed=1)
r2 = solve(p2, SolverConfig(tol=1e-5, max_kkt=20_000, scaling="ruiz"))
assert r2.status == Status.SOLVED, r2.status_string
print(f"RESULT {proc_id} {r.iterations} {r.objective:.9f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_solve(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)
    results = {}
    for out in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("RESULT"))
        _, pid, k, obj = line.split()
        results[pid] = (int(k), float(obj))
    # Both processes computed the identical global solve.
    assert results["0"] == results["1"], results
    # And it matches the scipy oracle on the same instance.
    from tpdlp import generate_feasible_lp
    from tests.oracles import solve_oracle

    o = solve_oracle(generate_feasible_lp(n=45, m_ineq=26, m_eq=9, seed=0))
    assert abs(results["0"][1] - o.fun) < 1e-3 * (1 + abs(o.fun))
