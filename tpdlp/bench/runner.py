"""Head-to-head benchmark: tpdlp vs the reference torchPDLP.

Protocol per BASELINE.md: same instance, same algorithm settings
(precondition + adaptive stepsize + primal-weight update), both solvers to
the same relative KKT tolerance; record wall time, iterations k, KKT passes
j, restarts n, status, objective; derive iterations/s.

Seeding: the stepsize init is a random variable on BOTH sides (the
reference draws unseeded torch.rand, PDLP/helpers.py:43; run_reference
seeds torch), so iteration counts vary run to run and between solvers —
each side runs `--reps` seeded repetitions and the best-of-N row is
reported (best-of is also the contention-robust wall-time estimator on
the remote-tunnel TPU).  Iteration counts of all reps are recorded in
the JSON rows so the spread is visible.

Usage: python -m tpdlp.bench.runner [--classes small,medium] [--tol 1e-4]
       [--dtype float32] [--reps 3] [--skip-reference]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def run_ours(problem, tol, max_kkt, dtype_name, seed=0):
    import jax.numpy as jnp

    from tpdlp import SolverConfig, solve

    cfg = SolverConfig(
        tol=tol, max_kkt=max_kkt, scaling="ruiz", adaptive=True,
        primal_weight_update=True, time_limit=600,
    )
    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    # Warm once for compile (per-shape cache), then measure.  The warm run
    # uses a DIFFERENT seed: remote-tunnel TPU runtimes cache identical
    # (fn, args) dispatches, so a byte-identical measured rerun would time
    # the cache, not the device.
    r = solve(problem, cfg, dtype=dtype, seed=seed + 7919)
    t0 = time.perf_counter()
    r = solve(problem, cfg, dtype=dtype, seed=seed)
    wall = time.perf_counter() - t0
    return {
        "time": wall,
        "iterations": r.iterations,
        "kkt_passes": r.kkt_passes,
        "restarts": r.restarts,
        "objective": r.objective,
        "status": r.status_string,
        "iters_per_sec": r.iterations / wall if wall > 0 else float("nan"),
    }


def _best(runs):
    return max(runs, key=lambda r: r["iters_per_sec"])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", default="small,medium")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--max_kkt", type=int, default=100_000)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--reps", type=int, default=3,
                    help="seeded repetitions per side; best-of-N reported "
                         "(stepsize init is a random variable on BOTH "
                         "sides, and tunnel contention swings wall times "
                         "2-6x)")
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--json", action="store_true", help="JSON-lines output")
    args = ap.parse_args(argv)

    from tpdlp.bench.suite import build_suite

    problems = build_suite(tuple(args.classes.split(",")))
    rows = []
    for p in problems:
        ours_runs = [
            run_ours(p, args.tol, args.max_kkt, args.dtype, seed=s)
            for s in range(args.reps)
        ]
        ours = _best(ours_runs)
        ref = None
        if not args.skip_reference:
            from tpdlp.bench.reference_runner import run_reference

            ref_runs = [
                run_reference(p, tol=args.tol, max_kkt=args.max_kkt, seed=s)
                for s in range(args.reps)
            ]
            ref_runs = [r for r in ref_runs if r is not None]
            ref = _best(ref_runs) if ref_runs else None
        row = {"instance": p.name, "shape": list(p.shape), "ours": ours,
               "reference": ref,
               "ours_iters_all": [r["iterations"] for r in ours_runs],
               "ref_iters_all": (
                   [r["iterations"] for r in ref_runs] if ref else None
               )}
        if ref:
            row["speedup_time"] = ref["time"] / ours["time"]
            row["speedup_iters_per_sec"] = (
                ours["iters_per_sec"] / ref["iters_per_sec"]
            )
        rows.append(row)
        if args.json:
            print(json.dumps(row))
        else:
            r = row.get("speedup_time")
            print(
                f"{p.name:16s} {str(p.shape):14s} "
                f"ours: {ours['time']:7.3f}s k={ours['iterations']:6d} "
                f"[{ours['status'][:6]}]"
                + (
                    f"  ref: {ref['time']:8.3f}s k={ref['iterations']:6d} "
                    f"[{ref['status'][:6]}]  speedup x{r:.1f}"
                    if ref
                    else ""
                ),
                flush=True,
            )
    return rows


if __name__ == "__main__":
    main()
