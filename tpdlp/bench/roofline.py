"""Per-chip speed-of-light model for the fused PDHG step.

PDHG is memory-bound: each iteration streams the constraint operator twice
(K x-bar and K'y) plus O(m+n) vector traffic.  This harness times the fused
device loop on a synthetic instance, derives achieved HBM bandwidth from
the byte model, and reports it against the chip's peak — the "SpMV+update
fused step at memory-bandwidth speed-of-light" check from the BASELINE
north star.

Operator formats and their byte models (per iteration = one mv + one rmv):
    dense : 2 * m * n * itemsize          (the full matrix, both sweeps)
    band  : BandOp.stored_bytes()         (band slabs of K and K')
    ell   : stored ELL tiles of K and K'  (padded tiles, NOT m*n)
plus the restart-check resweep factor (1 + 2/restart_period) and ~14(m+n)
itemsize of fused vector traffic (lower-order).

Measurement protocol: the remote-tunnel backend charges a fixed ~30 ms
round trip per host-blocking dispatch, which pollutes per-iteration
numbers at small iteration counts (200 iters -> +150 us/iter).  The
harness therefore times TWO chunk lengths (iters/10 and iters) and reports
the MARGINAL per-iteration time from the two-point fit, which cancels the
fixed dispatch cost exactly.

Usage: python -m tpdlp.bench.roofline [--m 4000] [--n 10000]
       [--format dense|band|ell] [--iters 2000] [--dtype float32]
       [--peak-gbs 819]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _measure_chunk(st, pb, cfg, j_lo, j_hi):
    """Marginal seconds/KKT-pass between two chunk lengths."""
    import jax.numpy as jnp

    from tpdlp.solver.loop import run_chunk

    def timed(budget):
        t0 = time.perf_counter()
        out = run_chunk(st, pb, jnp.int32(budget), cfg)
        out.x.block_until_ready()
        return time.perf_counter() - t0, int(out.k)

    t_lo, k_lo = timed(j_lo)
    t_hi, k_hi = timed(j_hi)
    if k_hi <= k_lo:
        return float("nan"), k_hi
    return (t_hi - t_lo) / (k_hi - k_lo), k_hi - k_lo


def run_roofline(m, n, iters, dtype_name="float32", fmt="dense",
                 density=1.0, bandwidth=145, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpdlp import SolverConfig
    from tpdlp.io.generator import generate_banded_lp, generate_feasible_lp
    from tpdlp.solver.loop import run_chunk
    from tpdlp.solver.solve import _prepare

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    itemsize = jnp.dtype(dtype).itemsize
    cfg = SolverConfig(
        tol=0.0,  # never terminate: measure the pure iteration rate
        max_kkt=10**9,
        scaling="ruiz",
        adaptive=True,
        primal_weight_update=True,
    )
    mi = int(0.75 * m)
    if fmt == "dense":
        problem = generate_feasible_lp(
            n=n, m_ineq=mi, m_eq=m - mi, density=density, seed=seed
        )
        from tpdlp.problem import to_device_arrays

        op, c, q, l, u = to_device_arrays(problem, dtype)
        op_bytes = 2 * m * n * itemsize
    else:
        problem = generate_banded_lp(
            n=n, m_ineq=mi, m_eq=m - mi, bandwidth=bandwidth, seed=seed
        )
        c = jnp.asarray(problem.c, dtype)
        q = jnp.asarray(problem.q, dtype)
        l = jnp.asarray(problem.l, dtype)
        u = jnp.asarray(problem.u, dtype)
        if fmt == "band":
            from tpdlp.ops.band import BandOp

            op = BandOp.from_scipy(problem.K, dtype)
            assert op is not None, "instance not band-like"
            op_bytes = op.stored_bytes()
        elif fmt == "ell":
            from tpdlp.ops.blocked import BlockEllOp

            op = BlockEllOp.from_scipy(problem.K.tocsr(), dtype)
            op_bytes = (
                op.fwd.tiles.size + op.bwd.tiles.size
            ) * itemsize
        else:
            raise ValueError(f"unknown format {fmt!r}")

    mask = jnp.asarray(np.arange(problem.m) < problem.m_ineq)
    pb, st = _prepare(op, c, q, l, u, mask, jax.random.PRNGKey(seed),
                      jnp.asarray(float("nan"), c.dtype), cfg)
    st.x.block_until_ready()

    # Warm (compile both chunk lengths), then two-point fit from a warm
    # state: the marginal rate cancels the fixed per-dispatch cost.
    st1 = run_chunk(st, pb, jnp.int32(32), cfg)
    st1.x.block_until_ready()
    j0 = int(st1.j)
    sec_per_pass, k_done = _measure_chunk(
        st1, pb, cfg, j0 + max(50, iters // 10), j0 + iters
    )

    per_iter_bytes = op_bytes * (1 + 2 / cfg.restart_period) + 14 * (
        m + n
    ) * itemsize
    gbs = per_iter_bytes / sec_per_pass / 1e9
    return {
        "m": m,
        "n": n,
        "format": fmt,
        "dtype": dtype_name,
        "iterations": k_done,
        "sec_per_iter": sec_per_pass,
        "iters_per_sec": 1.0 / sec_per_pass,
        "op_mbytes": op_bytes / 1e6,
        "achieved_gbs": gbs,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4000)
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--format", default="dense",
                    choices=("dense", "band", "ell"))
    ap.add_argument("--bandwidth", type=int, default=145,
                    help="band width of the banded fixture (band/ell)")
    ap.add_argument(
        "--peak-gbs", type=float, default=819.0,
        help="chip HBM peak (v5e: 819 GB/s, v5p: 2765 GB/s)",
    )
    args = ap.parse_args(argv)
    r = run_roofline(args.m, args.n, args.iters, args.dtype,
                     fmt=args.format, bandwidth=args.bandwidth)
    r["peak_gbs"] = args.peak_gbs
    r["fraction_of_peak"] = r["achieved_gbs"] / args.peak_gbs
    print(
        f"[roofline] ({args.m} x {args.n}, {args.format}, {args.dtype}) "
        f"{r['iters_per_sec']:.0f} it/s -> {r['achieved_gbs']:.0f} GB/s "
        f"= {100 * r['fraction_of_peak']:.0f}% of {args.peak_gbs:.0f} GB/s peak",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"fused_step_hbm_fraction_of_peak_{args.format}",
        "value": round(r["fraction_of_peak"], 3),
        "unit": "fraction",
        "detail": {k: round(v, 6) if isinstance(v, float) else v
                   for k, v in r.items()},
    }))
    return r


if __name__ == "__main__":
    main()
