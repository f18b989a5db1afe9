"""CLI driver: sweep a folder of MPS instances and write a results CSV.

Flag and behavior parity with the reference CLI (PDLP/main.py:11-174):
same flag names, per-instance try/except so one bad LP doesn't kill the
sweep (reference :88-102,152-162), and the same CSV schema
(File, Objective, Iterations (k), Restarts (n), KKT Passes (j), Time (s),
Status — reference :142-150).  TPU-native additions: --scaling (ruiz+pc),
--adaptive_rule, --dtype, --mesh RxC for sharded solves, --batch for the
vmapped multi-instance path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="tpdlp — TPU-native restarted-PDHG LP solver"
    )
    # Reference-parity flags (PDLP/main.py:11-39).
    p.add_argument("--device", type=str, choices=["cpu", "tpu", "auto"],
                   default="auto",
                   help="Backend: 'cpu', 'tpu', or 'auto' (default: auto)")
    p.add_argument("--instance_path", type=str, default="feasible",
                   help="Folder containing .mps instances, or one .mps file")
    p.add_argument("--tolerance", type=float, default=1e-4)
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--precondition", action="store_true",
                   help="Enable Ruiz preconditioning")
    p.add_argument("--primal_weight_update", action="store_true")
    p.add_argument("--adaptive_stepsize", action="store_true")
    p.add_argument("--infeasibility_detect", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--support_sparse", action="store_true",
                   help="Autotune dense vs sparse constraint operator")
    p.add_argument("--matrix_format", type=str, default=None,
                   choices=["dense", "sparse", "band", "auto"],
                   help="Force the operator layout (overrides "
                        "--support_sparse; 'band' = band-slab Pallas)")
    p.add_argument("--max_kkt", type=int, default=100_000)
    p.add_argument("--time_limit", type=int, default=3600)
    p.add_argument("--fishnet", action="store_true",
                   help="Fishnet multi-point warm start")
    # TPU-native extensions.
    p.add_argument("--scaling", type=str, default=None,
                   choices=["none", "ruiz", "ruiz+pc"],
                   help="Override scaling method (--precondition => ruiz)")
    p.add_argument("--adaptive_rule", type=str, default="reference",
                   choices=["reference", "linesearch"])
    p.add_argument("--infeas_tol", type=float, default=1e-4)
    p.add_argument("--dtype", type=str, default=None,
                   choices=[None, "float32", "float64"])
    p.add_argument("--mesh", type=str, default=None,
                   help="RxC mesh for a sharded solve, e.g. 2x4")
    p.add_argument("--presolve", type=str, default="off",
                   choices=["off", "python", "cpp"],
                   help="PaPILO-equivalent presolve/postsolve round trip")
    p.add_argument("--compat_fr_zero", action="store_true",
                   help="Reproduce the reference's FR-bound quirk "
                        "(lo=0 instead of -inf, PDLP/util.py:162-164)")
    p.add_argument("--step_scheme", type=str, default="vanilla",
                   choices=["vanilla", "halpern"],
                   help="iteration scheme: the reference's restarted PDHG, "
                        "or Halpern-anchored reflected PDHG (~2x fewer "
                        "iterations at tight tolerances; fixed steps only)")
    p.add_argument("--batch_solve", action="store_true",
                   help="solve the whole folder as one vmapped fleet "
                        "(same-device batch; ragged shapes padded)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--abs_gap_termination", action="store_true",
                   help="certify |gap| <= tol(1+|p|+|d|), the standard "
                        "PDLP criterion; default matches the reference's "
                        "signed gap (helpers.py:127), which any negative "
                        "gap satisfies")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    if args.fishnet and args.presolve != "off":
        raise SystemExit(
            "--fishnet cannot be combined with --presolve: the fishnet "
            "warm start lives in the original variable space but the "
            "solve would run on the presolve-reduced problem"
        )
    if args.device != "auto":
        os.environ.setdefault("JAX_PLATFORMS", args.device)
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tpdlp import SolverConfig, read_mps, solve
    from tpdlp.solver.solve import default_dtype

    print(f"tpdlp backend: {jax.default_backend()} "
          f"({len(jax.devices())} device(s))")

    scaling = args.scaling
    if scaling is None:
        scaling = "ruiz" if args.precondition else "none"

    cfg = SolverConfig(
        tol=args.tolerance,
        max_kkt=args.max_kkt,
        time_limit=float(args.time_limit),
        scaling=scaling,
        adaptive=args.adaptive_stepsize,
        adaptive_rule=args.adaptive_rule,
        primal_weight_update=args.primal_weight_update,
        infeasibility_detect=args.infeasibility_detect,
        infeas_tol=args.infeas_tol,
        step_scheme=args.step_scheme,
        abs_gap_termination=args.abs_gap_termination,
        verbose=args.verbose,
    )

    mesh = None
    if args.mesh:
        from tpdlp.shard import make_solver_mesh

        r, c = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_solver_mesh(shape=(r, c))

    dtype = None
    if args.dtype:
        import jax.numpy as jnp

        dtype = jnp.float32 if args.dtype == "float32" else jnp.float64

    print("\nConfiguration:")
    for k, v in (
        ("Instance path", args.instance_path),
        ("Tolerance", args.tolerance),
        ("Output path", args.output_path),
        ("Time limit", f"{args.time_limit} seconds"),
        ("Max KKT passes", args.max_kkt),
        ("Scaling", scaling),
        ("Primal weight update", args.primal_weight_update),
        ("Adaptive stepsize", args.adaptive_stepsize),
        ("Infeasibility detection", args.infeasibility_detect),
        ("Fishnet", args.fishnet),
        ("Mesh", args.mesh),
    ):
        print(f"{k}: {v}")

    if os.path.isfile(args.instance_path):
        mps_files = [args.instance_path]
        folder = os.path.dirname(args.instance_path)
    else:
        folder = args.instance_path
        mps_files = sorted(
            os.path.join(folder, f)
            for f in os.listdir(folder)
            if f.endswith(".mps")
        )

    results = []
    failed_row = lambda name, msg: {
        "File": name,
        "Objective": "N/A",
        "Iterations (k)": "N/A",
        "Restarts (n)": "N/A",
        "KKT Passes (j)": "N/A",
        "Time (s)": "N/A",
        "Status": msg if len(msg) <= 60 else msg[:57] + "...",
        "Sense": "N/A",
    }

    if args.batch_solve and (args.fishnet or args.presolve != "off" or mesh):
        print("--batch_solve does not compose with --fishnet/--presolve/"
              "--mesh; falling back to the sequential sweep.")
        args.batch_solve = False
    if args.batch_solve and len(mps_files) > 1:
        # Fleet mode: solve the whole folder as one vmapped device program
        # (ragged shapes padded exactness-preserving).  Per-file load
        # failures are reported per row; the batch solves the rest.
        from tpdlp.batch.vmapped import solve_batch

        loaded = []
        for path in mps_files:
            name = os.path.basename(path)
            try:
                loaded.append(
                    (name, read_mps(path, compat_fr_zero=args.compat_fr_zero))
                )
            except Exception as e:
                print(f"Failed to load MPS file: {path}. Error: {e}")
                results.append(failed_row(name, f"Failed to load: {e}"))
        if loaded:
            print(f"\nBatch-solving {len(loaded)} instances (vmap)...")
            try:
                batch = solve_batch(
                    [p for _, p in loaded], cfg, dtype=dtype,
                    seed=args.seed, restart_sync="global",
                    # Layout passthrough: shared-K fleets take any layout,
                    # distinct-K fleets dense or stacked band-slab.
                    matrix_format=args.matrix_format or "dense",
                )
                for (name, _), r in zip(loaded, batch):
                    row = r.csv_row(name)
                    # solve_time is the whole-batch wall; report the
                    # amortised per-instance time in the parity CSV.
                    row["Time (s)"] = (
                        f"{r.solve_time / len(batch):.4f} (batch-amortised)"
                    )
                    results.append(row)
                    print(f"{name}: {r.status_string}")
            except Exception as e:
                print(f"Batch solve failed: {e}")
                for name, _ in loaded:
                    results.append(failed_row(name, f"Batch failed: {e}"))
        mps_files = []

    for path in mps_files:
        name = os.path.basename(path)
        print(f"\nProcessing {path}...")
        try:
            problem = read_mps(path, compat_fr_zero=args.compat_fr_zero)
        except Exception as e:
            print(f"Failed to load MPS file: {path}. Error: {e}")
            results.append(failed_row(name, f"Failed to load: {e}"))
            continue
        try:
            time_used = 0.0
            x0 = y0 = None
            if args.fishnet:
                import jax as _jax

                from tpdlp.fishnet import spectral_cast
                from tpdlp.scaling.ruiz import scale_problem
                from tpdlp.solver.solve import build_device_operator

                t0 = time.perf_counter()
                dt = dtype if dtype is not None else default_dtype()
                # Same layout the solve will use (fishnet only needs the
                # LinOp mm/rmm interface): --fishnet --matrix_format
                # sparse/band must not densify a sparse-only-sized
                # instance (verdict r2 item 8).
                op, c, q, l, u = build_device_operator(
                    problem, dt,
                    args.matrix_format
                    or ("auto" if args.support_sparse else "dense"),
                )
                # Reference parity: the fishnet searches the SCALED problem
                # (PDLP/main.py:106-120); the chosen point is mapped back to
                # the original frame, which is solve()'s warm-start contract.
                op_s, c_s, q_s, l_s, u_s, d_row, d_col = _jax.jit(
                    lambda op, c, q, l, u: scale_problem(
                        op, c, q, l, u, method=scaling
                    )
                )(op, c, q, l, u)
                x0_s, y0_s = spectral_cast(
                    op_s, c_s, q_s, l_s, u_s, problem.m_ineq,
                    k=32, seed=args.seed,
                )
                x0 = np.asarray(d_col * x0_s)
                y0 = np.asarray(d_row * y0_s)
                time_used = time.perf_counter() - t0
                if args.verbose:
                    print(f"Fishnet completed in {time_used:.4f}s")

            result = solve(
                problem, cfg, dtype=dtype, x0=x0, y0=y0, seed=args.seed,
                time_used=time_used, mesh=mesh, presolve=args.presolve,
                # Reference parity: --support_sparse runs the dense/sparse
                # representation autotune (PDLP/util.py:29-74);
                # --matrix_format forces a layout explicitly.
                matrix_format=args.matrix_format or (
                    "auto" if args.support_sparse else "dense"
                ),
            )
            print(f"Solver uses {result.solve_time:.4f} seconds.")
            print(f"Status: {result.status_string}")
            results.append(result.csv_row(name))
        except Exception as e:
            print(f"Solver failed for {name}. Error: {e}")
            results.append(failed_row(name, f"Solver failed: {e}"))

    os.makedirs(args.output_path, exist_ok=True)
    if results:
        import pandas as pd

        csv_path = os.path.join(args.output_path, "solver_results.csv")
        pd.DataFrame(results).to_csv(csv_path, index=False)
        print(f"\nResults saved to CSV: {csv_path}")
    else:
        print("No results to save.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
