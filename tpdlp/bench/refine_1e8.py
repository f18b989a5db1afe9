"""High-accuracy (1e-8) certification benchmark on the current backend.

Reproduces the BASELINE.md "High accuracy" rows from one command: solve a
suite instance end-to-end at tol=1e-8 with the default escalation
(`escalation_mode="auto"` -> iterative refinement, fp32-only device
programs — tpdlp/solver/refine.py) and verify the objective against the
scipy/HiGHS oracle.  The same command produced the CPU artifact
(`artifacts/refine_mittelmann_s_cpu_r3.json`) and the TPU row; the
backend in use is recorded in the artifact so the two cannot be confused.

Reference context: the reference is fp32 throughout
(/root/reference/PDLP/util.py:240-246) and exhausts its KKT budget
Unsolved at tol=1e-8 (artifact `artifacts/ref_1e8_mittelmann_s_r3.json`).

Usage:
    python -m tpdlp.bench.refine_1e8 [--instance mittelmann-s]
        [--tol 1e-8] [--seed 0] [--matrix_format dense] [--out art.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from tpdlp.bench.suite import build_suite
from tpdlp.config import SolverConfig
from tpdlp.solver.solve import solve


def _oracle_objective(problem, time_limit=900.0):
    """HiGHS (scipy.linprog) optimum, incl. obj_offset; None if not optimal.

    Time-limited and disk-cached per instance name: on mittelmann-l-class
    LPs HiGHS itself can grind for HOURS (the earlier "hung" runs of this
    bench were all the oracle, not the solve), and the optimum of a fixed
    suite instance never changes."""
    import json
    import os

    import scipy.sparse as sp
    from scipy.optimize import linprog

    cache_path = os.path.join(
        os.path.dirname(__file__), "artifacts", "oracle_cache.json"
    )
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    name = getattr(problem, "name", None)
    if name and name in cache:
        return cache[name]

    K = problem.K
    if not sp.issparse(K):
        K = sp.csr_matrix(K)
    G, A = K[: problem.m_ineq], K[problem.m_ineq:]
    h, b = problem.q[: problem.m_ineq], problem.q[problem.m_ineq:]
    bounds = [
        (None if np.isneginf(lo) else lo, None if np.isposinf(up) else up)
        for lo, up in zip(problem.l, problem.u)
    ]
    res = None
    # mittelmann-l-class: dual simplex ("highs" default) ground for 55
    # minutes without finishing while IPM solved in ~8 — try both.
    for method in ("highs", "highs-ipm"):
        res = linprog(
            problem.c,
            A_ub=-G if G.shape[0] else None,
            b_ub=-h if G.shape[0] else None,
            A_eq=A if A.shape[0] else None,
            b_eq=b if A.shape[0] else None,
            bounds=bounds, method=method,
            options={"time_limit": time_limit},
        )
        if res.status == 0:
            break
    obj = (
        float(res.fun) + getattr(problem, "obj_offset", 0.0)
        if res is not None and res.status == 0
        else None  # cached too: a time-limited miss costs 2x the limit,
        # and re-attempting it on every bench run burned ~30 min/run on
        # mittelmann-l-free (HiGHS needs hours there)
    )
    if name:
        cache[name] = obj
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
    return obj


def run(instance="mittelmann-s", tol=1e-8, seed=0, matrix_format="dense",
        warm=True, verbose=False, max_kkt=100_000, escalation_tol=None,
        chunk_kkt_max=None, abs_gap=False):
    if instance.startswith("banded-"):
        # "banded-<n>-<m_ineq>-<m_eq>-<bandwidth>": the beyond-reference
        # scale family (the reference's dense path cannot represent
        # these at all — util.py:240-246 would need 40 GB at 100k).
        from tpdlp.io.generator import generate_banded_lp

        n_, mi_, me_, bw_ = (int(v) for v in instance.split("-")[1:])
        problem = generate_banded_lp(n=n_, m_ineq=mi_, m_eq=me_,
                                     bandwidth=bw_)
        problem.name = instance
    else:
        problems = {
            p.name: p
            for p in build_suite(("small", "medium", "large", "xl"))
        }
        problem = problems[instance]
    extra = {}
    if escalation_tol is not None:
        extra["escalation_tol"] = escalation_tol
    if chunk_kkt_max is not None:
        extra["chunk_kkt_max"] = chunk_kkt_max
    cfg = SolverConfig(tol=tol, scaling="ruiz", adaptive=True,
                       primal_weight_update=True, verbose=verbose,
                       max_kkt=max_kkt, abs_gap_termination=abs_gap,
                       **extra)
    if warm:
        # Warm the compiled programs with a DIFFERENT seed (same protocol
        # as bench.py): this backend AOT-compiles each program family on
        # first execution (~20-40 s each over the remote tunnel), which
        # would otherwise dominate the measured wall; a different seed
        # keeps the measured run out of the runtime's dispatch cache.
        solve(problem, cfg, seed=seed + 7919, matrix_format=matrix_format)
    start = time.perf_counter()
    r = solve(problem, cfg, seed=seed, matrix_format=matrix_format)
    wall = time.perf_counter() - start

    row = {
        "instance": instance,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "status": r.status.describe(),
        "iterations": int(r.iterations),
        "kkt": int(r.kkt_passes),
        "wall": round(wall, 1),
        "objective": r.objective,
        "primal_res": float(r.primal_res),
        "dual_res": float(r.dual_res),
        "gap": float(r.gap),
    }
    oracle_obj = _oracle_objective(problem)
    if oracle_obj is not None:
        row["oracle_obj"] = oracle_obj
        row["rel_err"] = abs(r.objective - oracle_obj) / max(1.0,
                                                             abs(oracle_obj))
    row["gap_criterion"] = "abs" if abs_gap else "signed (reference)"
    row["protocol"] = (
        f"python -m tpdlp.bench.refine_1e8 --instance {instance} "
        f"--tol {tol:g} --seed {seed} --matrix_format {matrix_format} "
        f"--max_kkt {max_kkt} "
        + ("--abs_gap " if abs_gap else "")
        + (f"--escalation_tol {escalation_tol:g} "
           if escalation_tol is not None else "")
        + (f"--chunk_kkt_max {chunk_kkt_max} "
           if chunk_kkt_max is not None else "")
        + "(escalation_mode=auto -> refine, ruiz+adaptive+pwu)"
    )
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--instance", default="mittelmann-s")
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--matrix_format", default="dense")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the compile-warming run")
    ap.add_argument("--verbose", action="store_true",
                    help="per-chunk progress records from the inner solves")
    ap.add_argument("--max_kkt", type=int, default=100_000,
                    help="global KKT-pass budget (mittelmann-l's 1e-6 "
                         "coarse stage alone needs >100k passes)")
    ap.add_argument("--escalation_tol", type=float, default=None,
                    help="coarse-stage tolerance override: refinement "
                         "re-centers from any incumbent, and on badly "
                         "conditioned instances a 1e-4 coarse stage + "
                         "zoomed (O(1)-conditioned) corrections beats "
                         "grinding the original problem to 1e-6")
    ap.add_argument("--chunk_kkt_max", type=int, default=None,
                    help="cap KKT passes per device dispatch (large "
                         "instances: keep dispatches ~10 s so the remote "
                         "tunnel never wedges on a minute-long dispatch)")
    ap.add_argument("--abs_gap", action="store_true",
                    help="certify |gap| <= tol(1+|p|+|d|) (the standard "
                         "PDLP criterion) instead of the reference's "
                         "signed gap, which any negative gap satisfies")
    args = ap.parse_args(argv)

    row = run(args.instance, args.tol, args.seed, args.matrix_format,
              warm=not args.no_warm, verbose=args.verbose,
              max_kkt=args.max_kkt, escalation_tol=args.escalation_tol,
              chunk_kkt_max=args.chunk_kkt_max, abs_gap=args.abs_gap)
    print(json.dumps(row, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=1)
        print(f"[refine_1e8] artifact written: {args.out}")
    return row


if __name__ == "__main__":
    main()
