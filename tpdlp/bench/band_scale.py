"""Beyond-reference scale: banded 100k x 100k on one chip (band layout).

Produces the BASELINE.md "one chip, 100k x 100k" row as a committed
artifact: status, iterations, wall, it/s, and the band layout's stored
bytes vs the dense envelope.  The reference cannot represent the
instance at all — its dense fp32 matrix would be 40 GB
(/root/reference/PDLP/util.py:240-246) — and its torch-CPU sparse COO
path measures ~779 ms per SpMV pair here (>= 3.7 h for the same
iteration count).

Usage:
    python -m tpdlp.bench.band_scale [--n 100000] [--tol 1e-4]
        [--out band_100k_r5.json]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from tpdlp.config import SolverConfig
from tpdlp.solver.solve import build_device_operator, solve


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--m_ineq", type=int, default=75_000)
    ap.add_argument("--m_eq", type=int, default=25_000)
    ap.add_argument("--bandwidth", type=int, default=105)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--max_kkt", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from tpdlp.io.generator import generate_banded_lp

    p = generate_banded_lp(n=args.n, m_ineq=args.m_ineq, m_eq=args.m_eq,
                           bandwidth=args.bandwidth, seed=args.seed)
    cfg = SolverConfig(tol=args.tol, max_kkt=args.max_kkt, scaling="ruiz",
                       adaptive=True, primal_weight_update=True,
                       time_limit=3000)
    import jax.numpy as jnp

    op, *_ = build_device_operator(p, jnp.float32, "band")
    stored = op.stored_bytes()
    if not args.no_warm:
        solve(p, cfg, seed=args.seed + 7919, matrix_format="band")
    t0 = time.perf_counter()
    r = solve(p, cfg, seed=args.seed, matrix_format="band")
    wall = time.perf_counter() - t0
    row = {
        "instance": f"banded-{args.n}-{args.m_ineq}-{args.m_eq}-"
                    f"{args.bandwidth}",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "nnz": int(p.K.nnz),
        "dense_envelope_gb": round(
            (args.m_ineq + args.m_eq) * args.n * 4 / 1e9, 1
        ),
        "band_stored_mb": round(stored / 1e6, 1),
        "status": r.status.describe(),
        "iterations": int(r.iterations),
        "kkt": int(r.kkt_passes),
        "wall": round(wall, 1),
        "it_per_s": round(r.iterations / wall, 1),
        "objective": r.objective,
        "primal_res": float(r.primal_res),
        "dual_res": float(r.dual_res),
        "gap": float(r.gap),
        "protocol": (
            f"python -m tpdlp.bench.band_scale --n {args.n} "
            f"--m_ineq {args.m_ineq} --m_eq {args.m_eq} "
            f"--bandwidth {args.bandwidth} --tol {args.tol:g} "
            f"--max_kkt {args.max_kkt} --seed {args.seed} "
            "(matrix_format=band, ruiz+adaptive+pwu)"
        ),
    }
    print(json.dumps(row, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(row, f, indent=1)
        print(f"[band_scale] artifact written: {args.out}")
    return row


if __name__ == "__main__":
    main()
