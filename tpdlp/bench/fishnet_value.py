"""Measure what the fishnet warm start is worth (verdict-r2 item 8).

The fishnet (reference: PDLP/spectral_casting.py) is carried for parity;
this command measures whether it actually pays: for every suite/corpus
instance it solves cold (x0 = y0 = 0, the reference default,
primal_dual_hybrid_gradient.py:31-36) and warm (spectral_cast start
point), with otherwise identical settings, and reports the iteration
counts.  Iteration counts are hardware-independent, so the verdict holds
on CPU and TPU alike; the fishnet's own cost is ~k=32 batched steps plus
one spectral-norm estimate, well under one restart period of work.

Usage:
    python -m tpdlp.bench.fishnet_value [--tol 1e-4] [--seed 0]
                                        [--out artifact.json]
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from tpdlp.bench.suite import build_corpus, build_suite
from tpdlp.config import SolverConfig
from tpdlp.fishnet import spectral_cast
from tpdlp.scaling.ruiz import scale_problem
from tpdlp.solver.solve import build_device_operator, solve


def measure(problem, cfg, dtype, seed):
    cold = solve(problem, cfg, dtype=dtype, seed=seed)

    # Identical wiring to the CLI --fishnet path (cli/main.py): search on
    # the scaled problem, hand the chosen point back in the original
    # frame (solve()'s warm-start contract).
    op, c, q, l, u = build_device_operator(problem, dtype or np.float32,
                                           "dense")
    op_s, c_s, q_s, l_s, u_s, d_row, d_col = jax.jit(
        lambda op, c, q, l, u: scale_problem(op, c, q, l, u,
                                             method=cfg.scaling)
    )(op, c, q, l, u)
    x0_s, y0_s = spectral_cast(op_s, c_s, q_s, l_s, u_s, problem.m_ineq,
                               k=32, seed=seed)
    warm = solve(problem, cfg, dtype=dtype, seed=seed,
                 x0=np.asarray(d_col * x0_s), y0=np.asarray(d_row * y0_s))
    return cold, warm


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--classes", default="small,medium,real")
    ap.add_argument("--out", default=None,
                    help="write raw rows as a JSON artifact")
    args = ap.parse_args(argv)

    classes = tuple(args.classes.split(","))
    problems = build_suite(tuple(c for c in classes if c != "real"))
    if "real" in classes:
        problems += build_corpus()

    cfg = SolverConfig(tol=args.tol, scaling="ruiz", adaptive=True,
                       primal_weight_update=True)
    rows = []
    for p in problems:
        cold, warm = measure(p, cfg, None, args.seed)
        row = dict(
            instance=p.name,
            cold_k=int(cold.iterations), warm_k=int(warm.iterations),
            cold_status=cold.status.describe(),
            warm_status=warm.status.describe(),
            delta_k=int(cold.iterations) - int(warm.iterations),
        )
        rows.append(row)
        print(f"{row['instance']:<16} cold k={row['cold_k']:>6} "
              f"warm k={row['warm_k']:>6} delta={row['delta_k']:>+6} "
              f"({row['cold_status'][:3]}/{row['warm_status'][:3]})")

    saved = [r for r in rows if r["delta_k"] > 0]
    print(f"\n{len(saved)}/{len(rows)} instances improve; median saving "
          f"{np.median([r['delta_k'] / max(1, r['cold_k']) for r in rows]):.0%}"
          " of cold iterations")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[fishnet_value] artifact written: {args.out}")
    return rows


if __name__ == "__main__":
    main()
