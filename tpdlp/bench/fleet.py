"""Scenario-batched fleet benchmark: many perturbed LPs per chip via vmap.

The BASELINE "Scenario-batched LP fleet (10k perturbed instances, vmap)"
config.  The reference can only solve instances sequentially in a Python
loop (PDLP/main.py:85-162); tpdlp runs the whole restarted solver vmapped
over the batch (tpdlp.batch.solve_batch), so a fleet of same-shape
perturbed instances is one device program whose PDHG step is a batched
(B, m, n) x (B, n) matmul on the MXU.

Workload: B cost-perturbed copies of a suite instance (perturbing c leaves
the planted-feasible region untouched, so every element stays feasible but
has its own optimum).  Reported: instances/s for the batched solve vs the
reference's sequential per-instance rate (measured on `ref_samples`
instances and averaged).

Usage: python -m tpdlp.bench.fleet [--batch 64] [--instance deg2-class]
       [--tol 1e-4] [--ref-samples 2] [--skip-reference]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time

import numpy as np


def perturbed_fleet(base, batch: int, rel: float = 0.05, seed: int = 0):
    """B copies of `base` with independently perturbed costs."""
    rng = np.random.default_rng(seed)
    out = []
    for b in range(batch):
        p = copy.deepcopy(base)
        p.c = p.c * (1.0 + rel * rng.standard_normal(p.c.shape))
        p.name = f"{base.name}#{b}"
        out.append(p)
    return out


def run_fleet(
    problems, tol, max_kkt, dtype_name="float32", restart_sync="global",
    warm_problems=None, matrix_format="dense", shared_operator="auto",
):
    """Measure instances/s for one batched solve.

    `warm_problems` (same shapes, DIFFERENT data) drive the compile-warm
    runs: remote-tunnel runtimes cache byte-identical dispatches, so
    warming on the measured fleet itself would time the cache, not the
    device.  Defaults to a re-perturbed copy of `problems`.
    """
    import jax.numpy as jnp

    from tpdlp import SolverConfig
    from tpdlp.batch.vmapped import solve_batch

    cfg = SolverConfig(
        tol=tol, max_kkt=max_kkt, scaling="ruiz", adaptive=True,
        primal_weight_update=True, time_limit=1200,
    )
    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    kw = dict(dtype=dtype, restart_sync=restart_sync,
              matrix_format=matrix_format, shared_operator=shared_operator)
    if warm_problems is None:
        rng = np.random.default_rng(104729)
        warm_problems = []
        for p in problems:
            w = copy.deepcopy(p)
            w.c = w.c * (1.0 + 0.01 * rng.standard_normal(w.c.shape))
            warm_problems.append(w)
    # Warm twice: the first call compiles; the second may still populate
    # the persistent compilation cache / reach late chunk programs.
    solve_batch(warm_problems, cfg, **kw)
    solve_batch(warm_problems, cfg, **kw)
    t0 = time.perf_counter()
    rs = solve_batch(problems, cfg, **kw)
    wall = time.perf_counter() - t0
    solved = sum(r.status_string == "Solved" for r in rs)
    return {
        "time": wall,
        "batch": len(problems),
        "solved": solved,
        "instances_per_sec": len(problems) / wall,
        "max_iterations": max(r.iterations for r in rs),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--instance", default="deg2-class")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--max_kkt", type=int, default=100_000)
    ap.add_argument("--ref-samples", type=int, default=2)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--matrix_format", default="dense",
                    choices=("dense", "sparse", "band", "auto"))
    ap.add_argument("--banded", action="store_true",
                    help="use a DISTINCT banded fleet (one banded LP per "
                         "seed, stacked band-slab layout) instead of the "
                         "cost-perturbed shared-K fleet; --instance is "
                         "then n,m_ineq,m_eq,bandwidth")
    ap.add_argument("--out", default=None,
                    help="write the full result row (with protocol and "
                         "backend) to this JSON artifact path")
    args = ap.parse_args(argv)

    if args.banded:
        from tpdlp.io.generator import generate_banded_lp

        n, mi, me, bw = (int(v) for v in args.instance.split(","))
        fleet = [
            generate_banded_lp(n=n, m_ineq=mi, m_eq=me, bandwidth=bw,
                               seed=s)
            for s in range(args.batch)
        ]
        warm = [
            generate_banded_lp(n=n, m_ineq=mi, m_eq=me, bandwidth=bw,
                               seed=10_000 + s)
            for s in range(args.batch)
        ]
        args.instance = f"banded_{n}x{mi + me}_bw{bw}"
        ours = run_fleet(fleet, args.tol, args.max_kkt,
                         warm_problems=warm,
                         matrix_format=args.matrix_format,
                         shared_operator=False)
    else:
        from tpdlp.bench.suite import build_suite

        base = next(
            p
            for p in build_suite(("small", "medium", "large"))
            if p.name == args.instance
        )
        fleet = perturbed_fleet(base, args.batch)
        ours = run_fleet(fleet, args.tol, args.max_kkt,
                         matrix_format=args.matrix_format)
    print(
        f"[fleet] ours: {ours['batch']} instances in {ours['time']:.2f}s "
        f"({ours['instances_per_sec']:.1f} inst/s, "
        f"{ours['solved']}/{ours['batch']} solved)",
        file=sys.stderr,
    )

    ref_rate = None
    if not args.skip_reference:
        from tpdlp.bench.reference_runner import run_reference

        times = []
        for p in fleet[: args.ref_samples]:
            r = run_reference(p, tol=args.tol, max_kkt=args.max_kkt)
            if r is None:
                break
            times.append(r["time"])
        if times:
            ref_rate = 1.0 / (sum(times) / len(times))
            print(
                f"[fleet] reference (torch cpu, sequential): "
                f"{1.0 / ref_rate:.2f}s/instance ({ref_rate:.2f} inst/s)",
                file=sys.stderr,
            )

    row = {
        "metric": f"fleet_{args.instance}_instances_per_sec",
        "value": round(ours["instances_per_sec"], 2),
        "unit": "instances/s",
        "vs_baseline": (
            round(ours["instances_per_sec"] / ref_rate, 2) if ref_rate else None
        ),
    }
    print(json.dumps(row))
    if args.out:
        import jax

        row.update({
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "batch": ours["batch"],
            "solved": ours["solved"],
            "wall": round(ours["time"], 2),
            "tol": args.tol,
            "reference_inst_per_sec": (
                round(ref_rate, 3) if ref_rate else None
            ),
            "protocol": "python -m tpdlp.bench.fleet " + " ".join(
                argv if argv is not None else __import__("sys").argv[1:]
            ),
        })
        with open(args.out, "w") as f:
            json.dump(row, f, indent=1)
        print(f"[fleet] artifact written: {args.out}", file=sys.stderr)
    return ours


if __name__ == "__main__":
    main()
