"""Multi-chip scaling validation: sharded solve over 1/2/4/8-device meshes.

On real pod slices the ("row","col") mesh rides ICI and this harness
reports scaling efficiency directly.  Without multi-chip hardware (this
image tunnels ONE TPU chip), it runs on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N): timings then share
one host's memory bandwidth and are *not* ICI efficiency numbers — what the
harness validates there is (a) the sharded program compiles and matches the
single-device trajectory, and (b) the compiled HLO contains the expected
communication structure: the SpMV pair lowers to local matmuls plus one
all-reduce per product (psum over "col" for K x, over "row" for K'y),
i.e. communication volume per iteration is O(m/R + n/C), independent of
nnz(K).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python -m tpdlp.bench.scaling [--m 512] [--n 1024] [--iters 200]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time


def _build(problem, mesh, dtype, cfg):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpdlp.ops.dense import DenseOp
    from tpdlp.problem import to_device_arrays
    from tpdlp.shard.mesh import (
        pad_problem_arrays,
        padded_sizes,
        shard_device_problem,
        shard_state,
    )
    from tpdlp.solver.solve import _prepare

    op, c, q, l, u = to_device_arrays(problem, dtype)
    mask = np.arange(problem.m) < problem.m_ineq
    if mesh is not None:
        K = np.asarray(op.mat)
        m, n = K.shape
        m_pad, n_pad = padded_sizes(m, n, mesh)
        K, c, q, l, u, mask = pad_problem_arrays(
            K, np.asarray(c), np.asarray(q), np.asarray(l), np.asarray(u),
            mask, m_pad, n_pad,
        )
        op = DenseOp(jnp.asarray(K))
        c, q, l, u = (jnp.asarray(v) for v in (c, q, l, u))
    pb, st = _prepare(
        op, c, q, l, u, jnp.asarray(mask), jax.random.PRNGKey(0),
        jnp.asarray(float("nan"), dtype), cfg,
    )
    if mesh is not None:
        pb = shard_device_problem(pb, mesh)
        st = shard_state(st, mesh)
    return pb, st


def run_scaling(m, n, iters, mesh_sizes=(1, 2, 4, 8), dtype_name="float32"):
    import jax
    import jax.numpy as jnp

    from tpdlp import SolverConfig, generate_feasible_lp
    from tpdlp.shard.mesh import make_solver_mesh
    from tpdlp.solver.loop import run_chunk

    dtype = jnp.float32 if dtype_name == "float32" else jnp.float64
    cfg = SolverConfig(tol=0.0, max_kkt=10**9, scaling="ruiz", adaptive=True)
    problem = generate_feasible_lp(
        n=n, m_ineq=int(0.75 * m), m_eq=m - int(0.75 * m), seed=0
    )
    devices = jax.devices()
    rows = []
    for nd in mesh_sizes:
        if nd > len(devices):
            continue
        mesh = make_solver_mesh(devices[:nd]) if nd > 1 else None
        pb, st = _build(problem, mesh, dtype, cfg)
        st1 = run_chunk(st, pb, jnp.int32(32), cfg)
        jax.block_until_ready(st1.x)
        j0 = int(st1.j)
        t0 = time.perf_counter()
        st2 = run_chunk(st1, pb, jnp.int32(j0 + iters), cfg)
        jax.block_until_ready(st2.x)
        dt = time.perf_counter() - t0
        k = int(st2.k) - int(st1.k)

        # Communication structure from the compiled HLO.
        hlo = (
            jax.jit(lambda s: run_chunk(s, pb, jnp.int32(10**6), cfg))
            .lower(st1)
            .compile()
            .as_text()
        )
        # Count only DEFINING instructions: the opcode is immediately
        # followed by "(" ("... = <type> all-reduce(...)"); operand
        # references ("%all-reduce.5") never are.
        n_allreduce = len(re.findall(r"\ball-reduce(?:-start)?\(", hlo))
        # Per-iteration collective volume under the ("row","col") layout:
        # K x psums an (m/R)-slice over the col axis, K'y an (n/C)-slice
        # over the row axis — O(m/R + n/C) elements regardless of
        # nnz(K), fp32.  This is the number the day real multi-chip
        # hardware appears: volume / ICI bandwidth bounds the comm time
        # per iteration.
        shape = dict(mesh.shape) if mesh else {"row": 1, "col": 1}
        m_pad, n_pad = pb.op.shape
        comm_elems = (
            (m_pad // shape["row"]) * (0 if shape["col"] == 1 else 1)
            + (n_pad // shape["col"]) * (0 if shape["row"] == 1 else 1)
        )
        # Trajectory match vs the single-device run: identical seed and
        # chunk schedule, so iterates must agree to fp32 roundoff
        # (padding is exactness-preserving).
        obj = float(jnp.dot(pb.c, st2.x))
        rows.append({
            "devices": nd,
            "mesh": shape,
            "iters_per_sec": k / dt,
            "all_reduces_in_program": n_allreduce,
            "comm_elems_per_iteration": int(comm_elems),
            "comm_bytes_per_iteration": int(comm_elems) * 4,
            "scaled_objective_after_chunks": obj,
        })
        print(
            f"[scaling] {nd} devices {rows[-1]['mesh']}: "
            f"{rows[-1]['iters_per_sec']:.0f} it/s, "
            f"{n_allreduce} all-reduce ops, "
            f"{comm_elems * 4} comm B/iter, obj {obj:.8f}",
            file=sys.stderr,
        )
    if len(rows) > 1:
        base_obj = rows[0]["scaled_objective_after_chunks"]
        for row in rows[1:]:
            rel = abs(row["scaled_objective_after_chunks"] - base_obj) / (
                1.0 + abs(base_obj)
            )
            row["trajectory_rel_err_vs_single"] = rel
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=512)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args(argv)
    rows = run_scaling(args.m, args.n, args.iters, dtype_name=args.dtype)
    print(json.dumps({"metric": "sharded_scaling_validation", "rows": rows}))
    return rows


if __name__ == "__main__":
    main()
