"""Run the reference torchPDLP on an LPProblem, for baseline measurement.

This *executes* the reference implementation (read-only mount) to produce
the BASELINE numbers — no reference code is vendored here.  The standard
form is handed over as torch tensors in the reference's layout
((n,1) column vectors, stacked K), matching PDLP/util.py:240-261.
"""

from __future__ import annotations

import sys
import time

REFERENCE_PATH = "/root/reference/PDLP"


def run_reference(problem, tol=1e-4, max_kkt=100_000, precondition=True,
                  adaptive=True, primal_update=True, time_limit=600,
                  seed=0):
    """Returns dict(time, iterations, kkt_passes, restarts, objective,
    status) from the reference pdlp_algorithm, or None if unavailable.

    `seed` controls torch's global PRNG: the reference's stepsize init
    draws unseeded `torch.rand` (PDLP/helpers.py:43), which makes its
    iteration count a random variable — seeding makes head-to-head rows
    reproducible."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import torch
        # NB the reference's own main.py does `from enhancements import
        # preconditioning`, a name that does not exist — its CLI crashes
        # with --precondition; the actual function is ruiz_precondition.
        from enhancements import ruiz_precondition as preconditioning
        from primal_dual_hybrid_gradient import pdlp_algorithm
    except Exception as e:  # pragma: no cover
        print(f"[baseline] reference unavailable: {e}", file=sys.stderr)
        return None

    torch.manual_seed(seed)
    device = torch.device("cpu")
    K = torch.tensor(
        problem.K.toarray() if hasattr(problem.K, "toarray") else problem.K,
        dtype=torch.float32,
    )
    c = torch.tensor(problem.c, dtype=torch.float32).view(-1, 1)
    q = torch.tensor(problem.q, dtype=torch.float32).view(-1, 1)
    l = torch.tensor(problem.l, dtype=torch.float32).view(-1, 1)
    u = torch.tensor(problem.u, dtype=torch.float32).view(-1, 1)

    t0 = time.perf_counter()
    time_used = 0.0
    dt_precond = None
    if precondition:
        K, c, q, l, u, dt_precond, time_used = preconditioning(
            c, K, q, l, u, device=device
        )
    x, obj, k, n, j, status, total_time = pdlp_algorithm(
        K, problem.m_ineq, c, q, l, u, device,
        max_kkt=max_kkt, tol=tol, verbose=False,
        restart_period=40, precondition=precondition,
        primal_update=primal_update, adaptive=adaptive,
        data_precond=dt_precond, infeasibility_detect=False,
        time_limit=time_limit, time_used=time_used,
    )
    wall = time.perf_counter() - t0
    return {
        "time": wall,
        "iterations": int(k),
        "kkt_passes": int(j),
        "restarts": int(n),
        "objective": float(obj),
        "status": str(status),
        "iters_per_sec": int(k) / wall if wall > 0 else float("nan"),
    }
