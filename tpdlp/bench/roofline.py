"""Per-chip speed-of-light model for the fused PDHG step.

PDHG is memory-bound: each iteration streams the constraint operator twice
(K x-bar and K'y) plus O(m+n) vector traffic.  This harness times the fused
device loop on a synthetic instance, derives achieved HBM bandwidth from
the byte model, and reports it against the chip's peak — the "SpMV+update
fused step at memory-bandwidth speed-of-light" check from the BASELINE
north star.

Byte model per iteration:
    operator: 2 * bytes(K)            (the mv/rmv pair)
              * (1 + 2/restart_period) (restart checks re-sweep the operator
                                        on the average iterate every period)
    vectors:  ~14 * (m + n) * itemsize (step + averaging + carry traffic;
              fused by XLA, a lower-order term for realistic m, n)

Usage: python -m tpdlp.bench.roofline [--m 4000] [--n 10000]
       [--iters 400] [--dtype float32] [--peak-gbs 819]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_roofline(m, n, iters, dtype_name="float32", density=1.0, seed=0):
    import jax
    import jax.numpy as jnp

    from tpdlp import SolverConfig, generate_feasible_lp
    from tpdlp.solver.loop import run_chunk
    from tpdlp.solver.solve import _prepare

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    cfg = SolverConfig(
        tol=0.0,  # never terminate: measure the pure iteration rate
        max_kkt=10**9,
        scaling="ruiz",
        adaptive=True,
        primal_weight_update=True,
    )
    problem = generate_feasible_lp(
        n=n, m_ineq=int(0.75 * m), m_eq=m - int(0.75 * m),
        density=density, seed=seed,
    )
    from tpdlp.problem import to_device_arrays
    import numpy as np

    op, c, q, l, u = to_device_arrays(problem, dtype)
    mask = jnp.asarray(np.arange(problem.m) < problem.m_ineq)
    pb, st = _prepare(op, c, q, l, u, mask, jax.random.PRNGKey(seed), cfg)
    st.x.block_until_ready()

    # Warm (compile), then measure a fresh budget from the warmed state.
    st1 = run_chunk(st, pb, jnp.int32(32), cfg)
    st1.x.block_until_ready()
    j0 = int(st1.j)
    t0 = time.perf_counter()
    st2 = run_chunk(st1, pb, jnp.int32(j0 + iters), cfg)
    st2.x.block_until_ready()
    dt = time.perf_counter() - t0
    k_done = int(st2.k) - int(st1.k)

    itemsize = jnp.dtype(dtype).itemsize
    op_bytes = m * n * itemsize  # dense operator sweep
    per_iter = 2 * op_bytes * (1 + 2 / cfg.restart_period) + 14 * (
        m + n
    ) * itemsize
    gbs = per_iter * k_done / dt / 1e9
    return {
        "m": m,
        "n": n,
        "dtype": dtype_name,
        "iterations": k_done,
        "time": dt,
        "iters_per_sec": k_done / dt,
        "achieved_gbs": gbs,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4000)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument(
        "--peak-gbs", type=float, default=819.0,
        help="chip HBM peak (v5e: 819 GB/s, v5p: 2765 GB/s)",
    )
    args = ap.parse_args(argv)
    r = run_roofline(args.m, args.n, args.iters, args.dtype)
    r["peak_gbs"] = args.peak_gbs
    r["fraction_of_peak"] = r["achieved_gbs"] / args.peak_gbs
    print(
        f"[roofline] ({args.m} x {args.n}, {args.dtype}) "
        f"{r['iters_per_sec']:.0f} it/s -> {r['achieved_gbs']:.0f} GB/s "
        f"= {100 * r['fraction_of_peak']:.0f}% of {args.peak_gbs:.0f} GB/s peak",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "fused_step_hbm_fraction_of_peak",
        "value": round(r["fraction_of_peak"], 3),
        "unit": "fraction",
        "detail": {k: round(v, 3) if isinstance(v, float) else v
                   for k, v in r.items()},
    }))
    return r


if __name__ == "__main__":
    main()
