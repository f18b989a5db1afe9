"""Headline benchmark: PDHG iterations/s on the flagship dense workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: fixed-step PDHG on a dense synthetic LP (n = m = 4096, fp32) —
the per-iteration SpMV pair K x / K'y plus vector updates, which is the
reference's hot loop (PDLP/primal_dual_hybrid_gradient_step.py:3-40).  Ours
runs fully fused inside `lax.while_loop` on the device; the baseline is the
same per-iteration workload implemented with torch (CPU — the reference
targets torch on whatever device is present, and this image has CPU torch),
mirroring the reference's tensor layout ((n,1) column vectors, separate
clamp/extrapolate/project ops).

vs_baseline = our iterations/s divided by the torch baseline's.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N = 4096
M_INEQ = 2048
M_EQ = 2048
ITERS_MEASURE = 600
DTYPE = "float32"


def _make_instance():
    from tpdlp import generate_feasible_lp

    return generate_feasible_lp(
        n=N, m_ineq=M_INEQ, m_eq=M_EQ, density=0.5, seed=0
    )


def bench_tpdlp(problem) -> float:
    """Our fused loop: iterations/s over a fixed iteration budget."""
    import jax
    import jax.numpy as jnp

    from tpdlp import SolverConfig
    from tpdlp.problem import to_device_arrays
    from tpdlp.solver.loop import run_chunk
    from tpdlp.solver.solve import _build_device_problem
    from tpdlp.solver.state import init_state

    dtype = jnp.float32 if DTYPE == "float32" else jnp.float64
    cfg = SolverConfig(tol=0.0, max_kkt=10**9, restart_period=10**9)
    op, c, q, l, u = to_device_arrays(problem, dtype)
    pb = _build_device_problem(op, c, q, l, u, problem.m_ineq, cfg)
    st = init_state(pb, jnp.asarray(1e-3, dtype), jnp.asarray(1.0, dtype))

    # Warmup (compile) then measure a fixed iteration budget.  A device->host
    # scalar read inside the timed region guarantees the wait (some PJRT
    # transports return from block_until_ready before remote execution ends).
    warm = run_chunk(st, pb, jnp.int32(3), cfg)
    k_warm = int(warm.k)
    t0 = time.perf_counter()
    out = run_chunk(warm, pb, jnp.int32(3 + ITERS_MEASURE), cfg)
    iters = int(out.k) - k_warm
    dt = time.perf_counter() - t0
    assert iters >= ITERS_MEASURE, iters
    print(f"[bench] tpdlp: {iters} iters in {dt:.3f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)
    return iters / dt


def bench_torch_reference(problem) -> float:
    """Reference-equivalent per-iteration workload in torch (CPU).

    Same math and tensor layout as the reference's fixed step
    (column vectors, clamp, extrapolate, dual update, per-row projection).
    """
    import torch

    torch.set_num_threads(torch.get_num_threads())
    dt = torch.float32 if DTYPE == "float32" else torch.float64
    K = torch.tensor(
        problem.K.toarray() if hasattr(problem.K, "toarray") else problem.K,
        dtype=dt,
    )
    c = torch.tensor(problem.c, dtype=dt).view(-1, 1)
    q = torch.tensor(problem.q, dtype=dt).view(-1, 1)
    l = torch.tensor(problem.l, dtype=dt).view(-1, 1)
    u = torch.tensor(problem.u, dtype=dt).view(-1, 1)
    m_ineq = problem.m_ineq
    n = K.shape[1]
    x = torch.zeros((n, 1), dtype=dt)
    y = torch.zeros((K.shape[0], 1), dtype=dt)
    eta, omega, theta = 1e-3, 1.0, 1.0

    def step(x, y):
        x_old = x.clone()
        grad = c - K.T @ y
        x = torch.clamp(x - eta / omega * grad, min=l, max=u)
        x_bar = x + theta * (x - x_old)
        y = y + eta * omega * (q - K @ x_bar)
        y[:m_ineq] = torch.clamp(y[:m_ineq], min=0.0)
        return x, y

    # Warmup then measure.
    for _ in range(3):
        x, y = step(x, y)
    iters = max(50, ITERS_MEASURE // 10)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, y = step(x, y)
    dt_s = time.perf_counter() - t0
    print(f"[bench] torch-cpu baseline: {iters} iters in {dt_s:.3f}s",
          file=sys.stderr)
    return iters / dt_s


def main():
    problem = _make_instance()
    ours = bench_tpdlp(problem)
    try:
        base = bench_torch_reference(problem)
    except Exception as e:  # torch missing/broken: report absolute only
        print(f"[bench] baseline failed: {e}", file=sys.stderr)
        base = None
    vs = (ours / base) if base else None
    print(json.dumps({
        "metric": "pdhg_iterations_per_sec_dense4096",
        "value": round(ours, 2),
        "unit": "iter/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
