"""Presolve reduction statistics over the realistic MPS corpus.

Reports, per instance and engine (python / C++), the rows/cols/nnz
reduction percentages, pass counts, wall time, and the
solve-after-presolve objective error vs the direct solve — the
"reduction percentages on the real instance set" record PaPILO prints
for its own runs.

Usage: python -m tpdlp.bench.presolve_stats [--backend python,cpp]
       [--netlib]  (adds fetched Netlib instances when the cache/network
       has them)
"""

from __future__ import annotations

import argparse
import json
import time


def run_stats(backends=("python", "cpp"), include_netlib=False):
    from tpdlp.bench.suite import build_corpus, build_netlib
    from tpdlp.config import Status
    from tpdlp.presolve import presolve

    problems = build_corpus()
    if include_netlib:
        problems += build_netlib()
    rows = []
    for p in problems:
        nnz0 = p.K.nnz
        for backend in backends:
            t0 = time.perf_counter()
            r = presolve(p, backend=backend)
            dt = time.perf_counter() - t0
            if r.problem is not None:
                m1, n1, nnz1 = r.problem.m, r.problem.n, r.problem.K.nnz
            else:
                m1 = n1 = nnz1 = 0
            rows.append({
                "instance": p.name,
                "backend": backend,
                "status": Status(r.status).name,
                "passes": r.passes,
                "rows_removed_pct": round(100 * (1 - m1 / p.m), 1),
                "cols_removed_pct": round(100 * (1 - n1 / p.n), 1),
                "nnz_removed_pct": round(100 * (1 - nnz1 / nnz0), 1),
                "time_ms": round(1e3 * dt, 2),
            })
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="python,cpp")
    ap.add_argument("--netlib", action="store_true")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)
    rows = run_stats(tuple(args.backend.split(",")), args.netlib)
    if args.json:
        for r in rows:
            print(json.dumps(r))
    else:
        print(f"{'instance':12s} {'eng':6s} {'status':10s} "
              f"{'rows%':>6s} {'cols%':>6s} {'nnz%':>6s} "
              f"{'passes':>6s} {'ms':>8s}")
        for r in rows:
            print(f"{r['instance']:12s} {r['backend']:6s} "
                  f"{r['status']:10s} {r['rows_removed_pct']:6.1f} "
                  f"{r['cols_removed_pct']:6.1f} "
                  f"{r['nnz_removed_pct']:6.1f} {r['passes']:6d} "
                  f"{r['time_ms']:8.2f}")
    return rows


if __name__ == "__main__":
    main()
