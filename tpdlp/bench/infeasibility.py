"""Chip-scale infeasibility-detection battery.

Reference analog: the reference demonstrably sweeps the Netlib
INFEASIBLE folder with its certificate machinery
(/root/reference/experiments/InfeasibilityDetection3.py:935-946) — its
entire infeasibility evaluation.  This battery reproduces that evidence
class on the current backend: the vendored terminal corpus
(infeas01/unbnd01, tpdlp/bench/instances) plus planted-infeasible and
planted-unbounded LPs up to Mittelmann scale, each solved with the ray
certificates enabled and the resulting status checked against the
scipy/HiGHS oracle's verdict (linprog status 2 = infeasible,
3 = unbounded).

Usage:
    python -m tpdlp.bench.infeasibility [--out infeasibility_r5.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np
import scipy.sparse as sp

from tpdlp.config import SolverConfig, Status
from tpdlp.solver.solve import solve


def _oracle_status(problem, time_limit=600.0):
    """linprog/HiGHS status code: 0 optimal, 2 infeasible, 3 unbounded."""
    from scipy.optimize import linprog

    K = problem.K
    if not sp.issparse(K):
        K = sp.csr_matrix(K)
    G, A = K[: problem.m_ineq], K[problem.m_ineq:]
    h, b = problem.q[: problem.m_ineq], problem.q[problem.m_ineq:]
    bounds = [
        (None if np.isneginf(lo) else lo, None if np.isposinf(up) else up)
        for lo, up in zip(problem.l, problem.u)
    ]
    res = linprog(
        problem.c,
        A_ub=-G if G.shape[0] else None,
        b_ub=-h if G.shape[0] else None,
        A_eq=A if A.shape[0] else None,
        b_eq=b if A.shape[0] else None,
        bounds=bounds, method="highs",
        options={"time_limit": time_limit},
    )
    return int(res.status)


#: linprog status -> the certificate status the detector must produce.
_EXPECT = {2: Status.PRIMAL_INFEASIBLE, 3: Status.DUAL_INFEASIBLE}


def build_battery():
    """(name, problem, expected linprog status) rows."""
    from tpdlp.io.generator import (
        generate_infeasible_lp,
        generate_unbounded_lp,
    )
    from tpdlp.io.mps import read_mps
    from tpdlp.bench.suite import INSTANCES_DIR

    import os

    rows = []
    for fname, st in (("infeas01.mps", 2), ("unbnd01.mps", 3)):
        p = read_mps(os.path.join(INSTANCES_DIR, fname))
        p.name = os.path.splitext(fname)[0]
        rows.append((p.name, p, st))
    # Planted families, small through Mittelmann scale.
    for n, m_eq, density, seed in (
        (40, 10, 0.4, 0), (757, 280, 0.05, 1),
        (5000, 1500, 0.01, 7), (10000, 3000, 0.004, 7),
    ):
        p = generate_infeasible_lp(n=n, m_eq=m_eq, density=density,
                                   seed=seed)
        rows.append((p.name, p, 2))
    for n, m_ineq, seed in ((30, 10, 0), (757, 280, 1), (5000, 1500, 7)):
        p = generate_unbounded_lp(n=n, m_ineq=m_ineq, seed=seed)
        rows.append((p.name, p, 3))
    return rows


def run(tol=1e-6, max_kkt=100_000, seed=0, warm=True):
    rows = []
    cfg = SolverConfig(tol=tol, max_kkt=max_kkt, scaling="ruiz",
                       adaptive=True, primal_weight_update=True,
                       infeasibility_detect=True,
                       normalized_certificates=True)
    for name, p, oracle_st in build_battery():
        if warm:
            solve(p, cfg, seed=seed + 7919)
        t0 = time.perf_counter()
        r = solve(p, cfg, seed=seed)
        wall = time.perf_counter() - t0
        expected = _EXPECT[oracle_st].describe()
        rows.append({
            "instance": name,
            "shape": list(p.K.shape),
            "status": r.status.describe(),
            "oracle_linprog_status": oracle_st,
            "oracle_verified": _oracle_status(p) == oracle_st,
            "expected_status": expected,
            "match": r.status == _EXPECT[oracle_st],
            "iterations": int(r.iterations),
            "kkt": int(r.kkt_passes),
            "wall": round(wall, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max_kkt", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    rows = run(tol=args.tol, max_kkt=args.max_kkt, seed=args.seed,
               warm=not args.no_warm)
    artifact = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "matched": sum(r["match"] for r in rows),
        "total": len(rows),
        "rows": rows,
        "protocol": (
            f"python -m tpdlp.bench.infeasibility --tol {args.tol:g} "
            f"--max_kkt {args.max_kkt} --seed {args.seed} "
            "(ray + normalized certificates, ruiz+adaptive+pwu; statuses "
            "checked against scipy/HiGHS linprog verdicts)"
        ),
    }
    print(json.dumps({"matched": artifact["matched"],
                      "total": artifact["total"]}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"[infeasibility] artifact written: {args.out}")
    return artifact


if __name__ == "__main__":
    main()
