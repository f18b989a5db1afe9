"""Public solve API: preprocessing, chunked device loop, result assembly.

Reference analog: `pdlp_algorithm` (PDLP/primal_dual_hybrid_gradient.py:7-181)
plus the per-instance orchestration of PDLP/main.py:104-137 (scaling, warm
start, solve).  Differences by design:

- The iteration loop is fully device-resident (`tpdlp.solver.loop`); the
  host only re-dispatches bounded chunks of KKT passes so wall-clock limits
  are enforced without per-iteration `time.time()` syncs (the reference
  polls the clock every iteration, :68-74).
- Scaling, power iteration, and init are jitted.
- Results carry both raw arrays and the reference's CSV fields.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpdlp.config import SolverConfig, Status
from tpdlp.problem import LPProblem, device_problem, to_device_arrays
from tpdlp.scaling.ruiz import scale_problem
from tpdlp.solver.loop import (
    blocked_allowed,
    final_eval,
    run_chunk,
    run_chunk_auto_impl,
)
from tpdlp.solver.power_iteration import spectral_norm_estimate
from tpdlp.solver.state import init_state


@dataclasses.dataclass
class SolveResult:
    """Solver output (reference CSV schema: PDLP/main.py:142-150)."""

    x: np.ndarray  # primal solution in the original (unscaled) space
    y: np.ndarray  # dual solution in the original space
    #: c'x + obj_offset on the original problem, in MINIMIZATION form
    #: (the internal standard form; MAX inputs were negated at parse).
    #: Use `objective_original_sense` for the source file's convention.
    objective: float
    iterations: int  # k
    restarts: int  # n
    kkt_passes: int  # j
    status: Status
    solve_time: float
    primal_res: float
    dual_res: float
    gap: float
    #: Optional per-chunk progress records (when solve(log_history=True)):
    #: dicts of k/j/n/restart counters, residuals, gap, eta, omega, time.
    history: Optional[list] = None
    #: Constant already included in `objective` (MPS objective-row RHS +
    #: presolve-fixed contributions), kept so the raw c'x is recoverable.
    obj_offset: float = 0.0
    #: Source file's objective sense ("MIN"/"MAX").
    objective_sense: str = "MIN"

    @property
    def status_string(self) -> str:
        return self.status.describe()

    @property
    def objective_original_sense(self) -> float:
        """Objective in the source file's sense: for an OBJSENSE MAX input
        the maximized value -c'x + obj_offset, else `objective` as is."""
        if self.objective_sense == "MAX":
            return -(self.objective - self.obj_offset) + self.obj_offset
        return self.objective

    def csv_row(self, name: str) -> dict:
        return {
            "File": name,
            "Objective": f"{self.objective_original_sense:.6f}",
            "Iterations (k)": self.iterations,
            "Restarts (n)": self.restarts,
            "KKT Passes (j)": self.kkt_passes,
            "Time (s)": f"{self.solve_time:.4f}",
            "Status": self.status_string,
            "Sense": self.objective_sense,
        }


def _build_device_problem(op, c, q, l, u, m_ineq, cfg: SolverConfig,
                          ineq_mask=None):
    """Scale and assemble the DeviceProblem (jit-compiled inner)."""

    @functools.partial(jax.jit, static_argnames=("method",))
    def inner(op, c, q, l, u, method):
        op_s, c_s, q_s, l_s, u_s, d_row, d_col = scale_problem(
            op, c, q, l, u,
            method=method,
            ruiz_iters=cfg.ruiz_iters,
            ruiz_eps=cfg.ruiz_eps,
            pc_alpha=cfg.pock_chambolle_alpha,
        )
        return op_s, c_s, q_s, l_s, u_s, d_row, d_col

    op_s, c_s, q_s, l_s, u_s, d_row, d_col = inner(op, c, q, l, u, cfg.scaling)
    if cfg.scaling == "none":
        return device_problem(
            op_s, c_s, q_s, l_s, u_s, m_ineq,
            ineq_mask=ineq_mask,
            compat_scaled_norms=cfg.compat_scaled_norms,
        )
    return device_problem(
        op_s, c_s, q_s, l_s, u_s, m_ineq,
        d_row=d_row, d_col=d_col,
        c0=c, q0=q, l0=l, u0=u,
        ineq_mask=ineq_mask,
        compat_scaled_norms=cfg.compat_scaled_norms,
    )


def eta_omega_of(pb, key, cfg: SolverConfig, om0=None):
    """eta = eta_safety/||K||_2 (power iteration), omega = ||c||/||q||
    guarded (primal_dual_hybrid_gradient.py:19-23).

    `om0`: optional traced override scalar (NaN = use the norm rule).
    The rule degenerates on near-zero-RHS problems — iterative
    refinement's correction LPs have ||q~|| ~ alpha_p * primal_res -> 0
    once the primal converges, blowing omega to ~1e7 and freezing the
    inner solves' dual progress — so such callers pass a sane weight.
    """
    eta0 = cfg.eta_safety / spectral_norm_estimate(
        pb.op, key, cfg.power_iters
    )
    c_norm = jnp.linalg.norm(pb.c)
    q_norm = jnp.linalg.norm(pb.q)
    omega0 = jnp.where(
        (q_norm > 1e-6) & (c_norm > 1e-6), c_norm / q_norm,
        jnp.ones((), pb.c.dtype),
    )
    if om0 is not None:
        om0 = jnp.asarray(om0, pb.c.dtype)
        omega0 = jnp.where(jnp.isnan(om0), omega0, om0)
    return eta0, omega0


def _prepare_impl(op, c, q, l, u, ineq_mask, key, x0, y0, cfg: SolverConfig,
                  om0=None):
    """Whole preprocessing pipeline as one traceable function: scaling,
    mask/problem assembly, power-iteration stepsize, primal weight, state
    init.  One device dispatch instead of dozens of eager ops (which cost
    a host round trip each on remote-tunnel TPU backends)."""
    op_s, c_s, q_s, l_s, u_s, d_row, d_col = scale_problem(
        op, c, q, l, u,
        method=cfg.scaling,
        ruiz_iters=cfg.ruiz_iters,
        ruiz_eps=cfg.ruiz_eps,
        pc_alpha=cfg.pock_chambolle_alpha,
    )
    if cfg.scaling == "none":
        pb = device_problem(
            op_s, c_s, q_s, l_s, u_s, 0, ineq_mask=ineq_mask,
            compat_scaled_norms=cfg.compat_scaled_norms,
        )
    else:
        pb = device_problem(
            op_s, c_s, q_s, l_s, u_s, 0,
            d_row=d_row, d_col=d_col, c0=c, q0=q, l0=l, u0=u,
            ineq_mask=ineq_mask,
            compat_scaled_norms=cfg.compat_scaled_norms,
        )
    eta0, omega0 = eta_omega_of(pb, key, cfg, om0)
    # Warm-start points arrive in the ORIGINAL coordinate frame (solve()'s
    # public contract; the reference likewise fishnets scaled data and feeds
    # the scaled solver, PDLP/main.py:106-120).  The loop iterates in the
    # scaled frame, so invert the unscale identity x = d_col * x_s here.
    # d_row/d_col are ones when scaling == "none".
    if x0 is not None:
        x0 = x0 / d_col
    if y0 is not None:
        y0 = y0 / d_row
    st = init_state(pb, eta0, omega0, x0, y0)
    return pb, st


# The constraint-matrix argument is DONATED: scaling produces a same-shaped
# matrix, so XLA reuses the original's HBM instead of holding both (the
# matrix dominates the solver's footprint; donation halves it).  Callers
# must not touch `op`'s buffers afterwards (solve() only reads .shape).
@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _prepare(op, c, q, l, u, ineq_mask, key, om0, cfg: SolverConfig):
    return _prepare_impl(op, c, q, l, u, ineq_mask, key, None, None, cfg,
                         om0)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _prepare_warm(op, c, q, l, u, ineq_mask, key, x0, y0, om0,
                  cfg: SolverConfig):
    return _prepare_impl(op, c, q, l, u, ineq_mask, key, x0, y0, cfg, om0)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _prepare_run(op, c, q, l, u, ineq_mask, key, budget, om0,
                 cfg: SolverConfig):
    """Preprocessing + the first iteration chunk, fused into ONE dispatch —
    a small LP then completes in a single host round trip."""
    pb, st = _prepare_impl(op, c, q, l, u, ineq_mask, key, None, None, cfg,
                           om0)
    return pb, run_chunk_auto_impl(st, pb, budget, cfg, aligned=True)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _prepare_warm_run(
    op, c, q, l, u, ineq_mask, key, x0, y0, budget, om0, cfg: SolverConfig
):
    pb, st = _prepare_impl(op, c, q, l, u, ineq_mask, key, x0, y0, cfg, om0)
    return pb, run_chunk_auto_impl(st, pb, budget, cfg, aligned=True)


@functools.partial(jax.jit, static_argnames=("use_prev",))
def _extract(pb, st, use_prev: bool = False):
    """Unscaled solution + objective in one dispatch (reference :158-161).

    `use_prev` (Halpern scheme): report the last feasible PDHG output
    (*_prev slots) — the carried z iterate may violate the box/cone.
    """
    x_s = st.x_prev if use_prev else st.x
    y_s = st.y_prev if use_prev else st.y
    x = pb.d_col * x_s
    y = pb.d_row * y_s
    return x, y, jnp.dot(pb.c0, x)


def _fetch_bundle(tree):
    """Device->host fetch of a result pytree.

    Single-process: one batched `jax.device_get`.  Multi-process
    (jax.distributed across hosts): arrays actually SHARDED across
    processes span non-addressable devices, so those leaves are
    allgathered first — every host gets the full solution (all hosts run
    the identical control flow, so the collectives are matched).  Fully
    addressable leaves (a mesh=None solve inside a distributed session)
    and fully replicated leaves (the scalar state entries) must NOT be
    gathered: `process_allgather` stacks them to a (num_processes, ...)
    array, breaking scalar probes.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        def fetch(x):
            if (
                hasattr(x, "is_fully_addressable")
                and not x.is_fully_addressable
                and not x.sharding.is_fully_replicated
            ):
                return multihost_utils.process_allgather(x, tiled=True)
            return x

        tree = jax.tree_util.tree_map(fetch, tree)
    return jax.device_get(tree)


def _result_bundle(pb, st, use_prev: bool = False):
    """Everything the host needs from a finished solve, as one pytree (so it
    moves device->host in a single batched transfer)."""
    x, y, obj = _extract(pb, st, use_prev)
    return (
        st.j, st.status, x, y, obj, st.k, st.n_restarts,
        st.primal_res, st.dual_res, st.gap,
    )


def _eta_omega_init(pb, cfg: SolverConfig, seed: int):
    """Jitted `eta_omega_of` from a seed (bench/driver entry points)."""

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def inner(pb, key, cfg):
        return eta_omega_of(pb, key, cfg)

    return inner(pb, jax.random.PRNGKey(seed), cfg)


def default_dtype():
    """fp64 on CPU (1e-8 work), fp32 on TPU (MXU-native; fp64 is emulated)."""
    return jnp.float64 if jax.default_backend() == "cpu" else jnp.float32


#: Tolerances at least this loose certify soundly against this backend's
#: reduced-precision MXU products (~1e-5 relative error, ignores
#: Precision.HIGHEST — ops/pallas_dense.py).  Dense and band layouts have
#: exact-fp32 twins that restart checks refresh carried products through;
#: block-ELL does NOT (ops/blocked.py "Precision caveat"), so explicit
#: tight-tolerance sparse solves are guarded below.
_SPARSE_SOUND_TOL = 1e-4


def _mxu_noisy() -> bool:
    """True when device fp32 matmuls carry MXU rounding (~1e-5 relative).

    XLA-CPU fp32 dots are exact; every accelerator backend in this image
    lowers fp32 `dot_general` to reduced-precision MXU passes.  Split out
    for tests to monkeypatch (the suite runs on a CPU mesh).
    """
    return jax.default_backend() != "cpu"


#: Emulated-fp64 solver programs above this matrix element count FAULT the
#: TPU worker on this backend (1e7 elements worked once then faulted on
#: repeat; 1.7e6, maros-class, is repeatedly solid across the full
#: battery).  Conservative limit, applied to every matrix format.  Guard
#: with a clear error instead of killing the process.
_F64_DENSE_ELEM_LIMIT = 4_000_000


def _f64_program_elems(problem, matrix_format: str) -> int:
    """Matrix element count the emulated-fp64 program will actually buffer:
    dense m*n for the dense format, nnz for sparse operators (their buffers
    scale with stored entries, not the dense envelope).  "auto" may still
    pick dense, so it is scored as dense unless that would densify an
    operator the autotuner itself would never materialise."""
    if matrix_format == "dense":
        return problem.m * problem.n
    nnz = problem.K.nnz if hasattr(problem.K, "nnz") else int(
        np.count_nonzero(problem.K)
    )
    if matrix_format == "sparse":
        return nnz
    if matrix_format == "band":
        from tpdlp.ops.band import band_stored_elems

        est = band_stored_elems(problem.K)
        # Not band-like: the operator build raises before any program is
        # compiled, so the score only needs to not pre-block that error.
        return est if est is not None else nnz
    # auto: dense is only a candidate below the autotuner's memory budget.
    from tpdlp.ops.autotune import dense_candidate_allowed

    if dense_candidate_allowed(problem.m, problem.n, jnp.float64):
        return problem.m * problem.n
    return nnz


def _f64_guard(elems: int, dtype, what: str):
    if (
        jax.default_backend() != "cpu"
        and jnp.dtype(dtype) == jnp.float64
        and elems > _F64_DENSE_ELEM_LIMIT
    ):
        raise ValueError(
            f"fp64 solve of {what} exceeds this TPU backend's "
            "emulated-fp64 program limit "
            f"(~{_F64_DENSE_ELEM_LIMIT:.0e} matrix elements; larger "
            "programs fault the worker).  Use fp32 (tol >= 1e-6), solve "
            "on CPU, or shard over a mesh."
        )


def build_device_operator(problem, dtype, matrix_format: str = "dense"):
    """Single-device operator + c/q/l/u for the chosen layout.

    The one host->device staging point shared by `solve()` and the CLI
    fishnet path (which must respect --matrix_format rather than densify:
    fishnet only needs the LinOp mm/rmm interface).  Non-dense layouts
    build the operator FIRST and never materialise the dense matrix — the
    sparse path exists precisely for instances whose dense form does not
    fit HBM.
    """
    if matrix_format == "dense":
        return to_device_arrays(problem, dtype)
    import scipy.sparse as sp

    from tpdlp.ops.autotune import choose_operator
    from tpdlp.ops.sparse import SparseOp

    if matrix_format == "sparse":
        K_sp = (
            problem.K.tocsr()
            if sp.issparse(problem.K)
            else sp.csr_matrix(problem.K)
        )
        op = SparseOp.from_scipy(K_sp, dtype)
    elif matrix_format == "band":
        from tpdlp.ops.band import BandOp

        op = BandOp.from_scipy(problem.K, dtype)
        if op is None:
            raise ValueError(
                "matrix_format='band': K is not band-like (some "
                "row-group's column span exceeds the window "
                "budget); use 'auto' or 'sparse'"
            )
    elif matrix_format == "auto":
        op, _ = choose_operator(problem.K, dtype)
    else:
        raise ValueError(f"unknown matrix_format: {matrix_format!r}")
    c = jnp.asarray(problem.c, dtype)
    q = jnp.asarray(problem.q, dtype)
    l = jnp.asarray(problem.l, dtype)
    u = jnp.asarray(problem.u, dtype)
    return op, c, q, l, u


def _solve_escalated(problem, cfg: SolverConfig, **kw):
    """Two-stage precision escalation (accelerator path for tol < 1e-6).

    Stage 1 iterates in fp32 to `cfg.escalation_tol`; stage 2 warm-starts
    fp64 from the fp32 solution and finishes to `cfg.tol`.  fp32 cannot
    converge below its iterate-precision floor (~1e-7 relative KKT) and
    emulated fp64 is ~50x slower per KKT pass on TPU, so the split is ~5x
    faster end-to-end than pure fp64 at identical solution quality
    (BASELINE.md).  Work/time budgets span both stages; counters are summed.
    """
    # 'auto' stage policy: the fp32 coarse stage runs vanilla PDHG with
    # adaptive stepsizes (robust at loose tolerances); the fp64 tail runs
    # the Halpern-anchored scheme, whose fixed-point-residual restart
    # criterion made it uniformly fastest at tight tolerances across the
    # benchmark suite (1.3-2.3x fewer iterations than vanilla-adaptive on
    # every instance tested).
    auto = cfg.escalation_scheme == "auto" and cfg.step_scheme == "vanilla"
    base = cfg
    if auto and not cfg.adaptive:
        base = cfg.replace(adaptive=True)
    coarse = base.replace(tol=max(cfg.escalation_tol, cfg.tol))
    # The coarse stage's result is intermediate (the fp64 tail is the
    # judge), so noisy sparse products at its sub-1e-4 tolerance are
    # acceptable — suppress solve()'s explicit-fp32 sparse guard.
    s1 = solve(problem, coarse, dtype=jnp.float32,
               _noisy_products_ok=True, **kw)
    if s1.status != Status.SOLVED:
        # Infeasibility certificates, budget exhaustion and timeouts are
        # terminal as-is; there is nothing useful to refine in fp64.
        return s1
    kkt_left = cfg.max_kkt - s1.kkt_passes
    if kkt_left <= 0:
        # Stage 1 certified only the coarse tolerance; with no budget left
        # for the fp64 tail the requested cfg.tol was NOT certified.
        return dataclasses.replace(s1, status=Status.KKT_LIMIT)
    kw2 = dict(kw)
    kw2["time_used"] = s1.solve_time  # already includes incoming time_used
    cfg2 = base.replace(max_kkt=kkt_left)
    if auto:
        cfg2 = cfg2.replace(step_scheme="halpern", adaptive=False)
    elems = _f64_program_elems(problem, kw.get("matrix_format", "dense"))
    if kw.get("mesh") is None and elems > _F64_DENSE_ELEM_LIMIT:
        n_dev = len(jax.devices())
        nnz = _f64_program_elems(problem, "sparse")
        if n_dev > 1 and nnz // n_dev <= _F64_DENSE_ELEM_LIMIT:
            # Route the fp64 tail through a sharded sparse solve: the
            # layout arrays are 1D-partitioned over all devices, so the
            # per-device emulated-fp64 buffers drop to ~stored/N — under
            # the single-chip program limit that made the unsharded tail
            # fault.  Band-like instances take the band layout (fastest
            # stream); everything else block-ELL.
            from tpdlp.ops.band import band_stored_elems
            from tpdlp.shard import make_solver_mesh

            band_elems = band_stored_elems(problem.K)
            kw2["mesh"] = make_solver_mesh()
            kw2["matrix_format"] = (
                "band"
                if band_elems is not None
                and band_elems // n_dev <= _F64_DENSE_ELEM_LIMIT
                else "sparse"
            )
        else:
            # Single device (or still over the limit even sharded): report
            # the uncertified-but-best-available fp32 result honestly.
            warnings.warn(
                "precision escalation skipped the fp64 tail: the problem "
                "exceeds this TPU backend's emulated-fp64 program limit "
                "and no multi-device mesh is available to shard it; "
                "returning the fp32 stage result with status KKT_LIMIT "
                f"(certified only to {cfg.escalation_tol:g})",
                RuntimeWarning,
                stacklevel=2,
            )
            return dataclasses.replace(s1, status=Status.KKT_LIMIT)
    s2 = solve(
        problem, cfg2, dtype=jnp.float64,
        x0=s1.x, y0=s1.y, **kw2,
    )
    history = None
    if s1.history is not None or s2.history is not None:
        history = (s1.history or []) + (s2.history or [])
    return dataclasses.replace(
        s2,
        iterations=s1.iterations + s2.iterations,
        restarts=s1.restarts + s2.restarts,
        kkt_passes=s1.kkt_passes + s2.kkt_passes,
        history=history,
    )


def solve(
    problem: LPProblem,
    config: SolverConfig = SolverConfig(),
    *,
    dtype=None,
    x0: Optional[np.ndarray] = None,
    y0: Optional[np.ndarray] = None,
    seed: int = 0,
    time_used: float = 0.0,
    mesh=None,
    matrix_format: str = "dense",
    presolve: str = "off",
    checkpoint_path=None,
    resume: bool = False,
    log_history: bool = False,
    op_cache: Optional[dict] = None,
    _noisy_products_ok: bool = False,
    omega0: Optional[float] = None,
) -> SolveResult:
    """Solve a standard-form LP with restarted PDHG.

    `op_cache` (advanced): a dict reused across solves whose problems
    share the SAME constraint matrix K (e.g. iterative-refinement
    correction LPs, perturbed-rhs families).  The built device operator is
    stored under (matrix_format, dtype) and reused, skipping the
    host->device matrix transfer — the dominant per-solve cost on
    remote-tunnel backends.  The caller guarantees K is unchanged.

    `x0`/`y0` are warm-start points in the ORIGINAL (unscaled) coordinate
    frame — the same frame `SolveResult.x/.y` are reported in, so a solve
    can be warm-started directly from another's solution.  They are mapped
    into the scaled frame internally.

    `time_used` is preprocessing time already spent (counts against
    config.time_limit, as in the reference's `time_used` threading,
    PDLP/main.py:107-136).

    `mesh` (a 2D jax.sharding.Mesh from tpdlp.shard.make_solver_mesh) runs
    the identical loop with K 2D block-partitioned across devices and the
    vectors sharded along the matching axes; GSPMD inserts the collectives.
    The problem is zero-padded to mesh-divisible dimensions (exactness
    preserved — see tpdlp.shard.mesh.pad_problem_arrays).

    `matrix_format`: "dense" | "sparse" (BCOO with materialised transpose;
    block-ELL row strips under a mesh) | "band" (band-slab layout — Pallas
    kernel single-device, flat-partitioned take+einsum under a mesh;
    raises when K is not band-like) | "auto" (time the SpMV-pair
    candidates and keep the faster, the reference's `sparse_vs_dense`
    autotune, PDLP/util.py:29-74).

    `presolve`: "off" | "python" | "cpp" — run the PaPILO-equivalent
    reduction engine first, solve the reduced LP, and map the solution back
    through the postsolve transformation (reference round trip:
    Packages/prepostsolve.py).  Warm starts are not combined with presolve
    (the reduced variable space differs).
    """
    start = time.perf_counter()
    cfg = config
    problem.validate()

    if presolve != "off":
        from tpdlp.presolve import presolve as run_presolve
        from tpdlp.presolve.reductions import (
            postsolve as run_postsolve,
            postsolve_dual as run_postsolve_dual,
        )

        if x0 is not None or y0 is not None:
            raise ValueError(
                "presolve + warm start is unsupported: x0/y0 are in the "
                "ORIGINAL variable/row space but the inner solve runs on "
                "the reduced problem; disable presolve or drop the warm "
                "start"
            )
        pres = run_presolve(problem, backend=presolve)
        pre_time = time.perf_counter() - start
        if pres.status != Status.RUNNING:
            if pres.status == Status.SOLVED:
                x_full = run_postsolve(np.zeros(0), pres.data)
                y_solved = run_postsolve_dual(
                    np.zeros(0), x_full, pres.data
                )
            else:  # infeasible/unbounded: no meaningful point
                x_full = np.zeros(problem.n)
                y_solved = np.zeros(problem.m)
            obj = float(np.dot(problem.c, x_full)) + problem.obj_offset
            return SolveResult(
                x=x_full,
                y=y_solved,
                objective=obj,
                obj_offset=problem.obj_offset,
                objective_sense=problem.objsense,
                iterations=0,
                restarts=0,
                kkt_passes=0,
                status=pres.status,
                solve_time=pre_time,
                primal_res=0.0,
                dual_res=0.0,
                gap=0.0,
            )
        # Checkpoint/resume and history ride on the inner (reduced-space)
        # solve — a resume must pair with the same presolve backend so the
        # reduced problem (and hence the saved carry's shapes) match.
        inner = solve(
            pres.problem, cfg, dtype=dtype, seed=seed,
            time_used=time_used + pre_time, mesh=mesh,
            matrix_format=matrix_format,
            checkpoint_path=checkpoint_path, resume=resume,
            log_history=log_history,
        )
        x_full = run_postsolve(inner.x, pres.data)
        # Dual postsolve (beyond the reference, whose PaPILO round trip is
        # primal-only — papilo_wrapper.cpp:37-45).
        y_full = run_postsolve_dual(inner.y, x_full, pres.data)
        return SolveResult(
            x=x_full,
            y=y_full,
            objective=float(np.dot(problem.c, x_full))
            + problem.obj_offset,
            obj_offset=problem.obj_offset,
            objective_sense=problem.objsense,
            iterations=inner.iterations,
            restarts=inner.restarts,
            kkt_passes=inner.kkt_passes,
            status=inner.status,
            solve_time=inner.solve_time,
            primal_res=inner.primal_res,
            dual_res=inner.dual_res,
            gap=inner.gap,
            history=inner.history,
        )

    if dtype is None:
        dtype = default_dtype()
        # Escalate below the fp32-iterate floor (escalation_tol) — and
        # for explicit block-ELL also below the MXU-product sound
        # envelope (_SPARSE_SOUND_TOL): ELL has no exact-fp32 product
        # twin, so a direct tol<1e-4 sparse solve on a noisy-MXU backend
        # would certify against ~1e-5-noisy products.  Refinement's
        # host-fp64 residuals are the judge on that route, which keeps
        # it sound at any tolerance.
        if (
            cfg.precision_escalation
            and dtype == jnp.float32
            and (
                cfg.tol < cfg.escalation_tol
                or (
                    # 'auto' resolves via the autotuner and may land on
                    # block-ELL on TPU, so it gets the same reroute: a
                    # dense resolution merely takes the (sound either
                    # way) refinement route one decade early.
                    matrix_format in ("sparse", "auto")
                    and cfg.tol < _SPARSE_SOUND_TOL
                    and _mxu_noisy()
                )
            )
            and x0 is None
            and y0 is None
        ):
            if cfg.escalation_mode == "fp64_tail":
                if not resume:
                    return _solve_escalated(
                        problem, cfg, seed=seed, time_used=time_used,
                        mesh=mesh, matrix_format=matrix_format,
                        checkpoint_path=checkpoint_path,
                        log_history=log_history,
                    )
            else:  # "refine" and "auto": fp32-only device programs
                from tpdlp.solver.refine import solve_refined

                return solve_refined(
                    problem, cfg, solve_fn=solve, seed=seed,
                    time_used=time_used, mesh=mesh,
                    matrix_format=matrix_format,
                    checkpoint_path=checkpoint_path, resume=resume,
                    log_history=log_history,
                )

    # Explicitly-forced fp32 noisy-product layout below the sound
    # envelope: the caller opted out of the escalation reroute above
    # (explicit dtype / warm start / escalation off), so say plainly what
    # the certificate is worth.  Internal escalation/refinement inner
    # solves pass _noisy_products_ok (their fp64 host residuals are the
    # judge).  The warning fires AFTER layout resolution, below, so that
    # matrix_format='auto' runs that resolve to a gather/ELL layout are
    # covered too (the round-4 pre-resolution guard missed 'auto').
    _noisy_tight_fp32 = (
        not _noisy_products_ok
        and jnp.dtype(dtype) == jnp.float32
        and cfg.tol < _SPARSE_SOUND_TOL
        and _mxu_noisy()
    )

    def _warn_noisy_sparse():
        import warnings

        warnings.warn(
            f"matrix_format={matrix_format!r} resolved to a block-ELL/"
            f"BCOO layout at tol={cfg.tol:g} on a reduced-precision-MXU "
            "backend: its products carry ~1e-5 relative error and have "
            "no exact-fp32 twin, so termination is sound only for tol "
            f">= {_SPARSE_SOUND_TOL:g} on this path. Use dtype=None "
            "(escalates through iterative refinement), "
            "matrix_format='dense'/'band' (exact-fp32 kernels), or "
            "treat the result as ~1e-4-certified.",
            stacklevel=3,
        )

    if mesh is None:
        _f64_guard(
            _f64_program_elems(problem, matrix_format), dtype,
            f"a {problem.m} x {problem.n} LP",
        )
    else:
        # Sharded: the fp64 buffers are partitioned, so the per-device
        # share is what the program-size limit applies to.
        _f64_guard(
            _f64_program_elems(problem, matrix_format) // mesh.size, dtype,
            f"a {problem.m} x {problem.n} LP (per-device share on a "
            f"{mesh.size}-device mesh)",
        )

    n_orig = problem.n
    mask = np.arange(problem.m) < problem.m_ineq
    cache_key = (
        (matrix_format, jnp.dtype(dtype).name, mesh is None,
         problem.K.shape)
        if op_cache is not None
        else None
    )
    if mesh is None:
        if cache_key is not None and cache_key in op_cache:
            # Hand the run a device-side COPY: jitted preprocessing donates
            # the operator buffers (HBM reuse), which would delete the
            # cached arrays.  An on-device copy costs no host transfer.
            op = jax.tree_util.tree_map(jnp.copy, op_cache[cache_key])
            c = jnp.asarray(problem.c, dtype)
            q = jnp.asarray(problem.q, dtype)
            l = jnp.asarray(problem.l, dtype)
            u = jnp.asarray(problem.u, dtype)
        else:
            op, c, q, l, u = build_device_operator(
                problem, dtype, matrix_format
            )
        if cache_key is not None:
            # Store a copy for the same donation reason as above.
            op_cache[cache_key] = jax.tree_util.tree_map(jnp.copy, op)
        if _noisy_tight_fp32:
            from tpdlp.ops.blocked import BlockEllOp
            from tpdlp.ops.sparse import SparseOp

            if isinstance(op, (BlockEllOp, SparseOp)):
                _warn_noisy_sparse()
    else:
        import scipy.sparse as sp

        from tpdlp.ops.autotune import dense_candidate_allowed
        from tpdlp.ops.blocked import BlockEllOp
        from tpdlp.ops.dense import DenseOp
        from tpdlp.shard.mesh import (
            flat_shardings,
            pad_vectors,
            padded_sizes,
            padded_sizes_sparse,
            problem_shardings,
            shard_block_ell,
            shard_device_problem,
            shard_state,
        )

        m, n = problem.m, problem.n
        # Mesh layout choice: "dense" -> 2D block partition of the dense
        # matrix; "sparse" -> block-ELL with a flat 1D row-strip partition
        # (the path for single LPs too big to densify, SURVEY §2.3);
        # "band" -> band slabs with the same flat partition (take+einsum
        # path: GSPMD partitions gathers/einsums, not Pallas kernels);
        # "auto" -> dense only while the dense matrix fits the memory
        # budget, sparse beyond it.
        band_mesh = matrix_format == "band"
        sparse_mesh = matrix_format == "sparse" or (
            matrix_format == "auto"
            and not dense_candidate_allowed(m, n, dtype)
        )
        if band_mesh:
            from tpdlp.ops.band import BandOp
            from tpdlp.shard.mesh import padded_sizes_band, shard_band

            m_pad, n_pad = padded_sizes_band(m, n, mesh)
            coo = (
                problem.K.tocoo()
                if sp.issparse(problem.K)
                else sp.coo_matrix(np.asarray(problem.K))
            )
            coo = sp.coo_matrix(
                (coo.data, (coo.row, coo.col)), shape=(m_pad, n_pad)
            )
            # Host-side layout build + ONE device_put per leaf with the
            # target sharding: no single device ever stages the whole
            # operator (this path exists for >HBM single LPs and the
            # fp64 escalation tail, where staging through one chip would
            # OOM or trip the emulated-fp64 buffer limit).
            op0 = BandOp.from_scipy(coo, dtype, host=True)
            if op0 is None:
                raise ValueError(
                    "matrix_format='band': K is not band-like (some "
                    "row-group's column span exceeds the window budget); "
                    "use 'sparse' or 'auto' with this mesh"
                )
            op = shard_band(op0, mesh)
            _, vec_s, _ = flat_shardings(mesh)
            yvec_s = xvec_s = vec_s
        elif sparse_mesh:
            m_pad, n_pad = padded_sizes_sparse(m, n, mesh)
            coo = (
                problem.K.tocoo()
                if sp.issparse(problem.K)
                else sp.coo_matrix(np.asarray(problem.K))
            )
            coo = sp.coo_matrix(
                (coo.data, (coo.row, coo.col)), shape=(m_pad, n_pad)
            )
            # Host-side layout build, then ONE device_put per leaf with
            # the target sharding (shard_block_ell): no single device
            # ever holds — or even stages — the whole operator, and
            # preprocessing runs distributed too.
            op = shard_block_ell(
                BlockEllOp.from_scipy(coo, dtype, host=True), mesh
            )
            if _noisy_tight_fp32:
                _warn_noisy_sparse()
            _, vec_s, _ = flat_shardings(mesh)
            yvec_s = xvec_s = vec_s
        else:
            K = (
                problem.K.toarray()
                if hasattr(problem.K, "toarray")
                else problem.K
            )
            K = np.asarray(K, dtype)
            m_pad, n_pad = padded_sizes(m, n, mesh)
            mat_s, yvec_s, xvec_s, _ = problem_shardings(mesh)
        c_p, q_p, l_p, u_p, mask = pad_vectors(
            np.asarray(problem.c, dtype), np.asarray(problem.q, dtype),
            np.asarray(problem.l, dtype), np.asarray(problem.u, dtype),
            mask, m_pad, n_pad,
        )
        if not sparse_mesh and not band_mesh:
            K_p = np.zeros((m_pad, n_pad), dtype=K.dtype)
            K_p[:m, :n] = K
            # device_put the HOST array with its sharding directly — a
            # jnp.asarray here would stage the full dense matrix on the
            # default device first.
            op = DenseOp(jax.device_put(K_p, mat_s))
        if x0 is not None:
            x0 = np.concatenate([np.asarray(x0), np.zeros(n_pad - n)])
        if y0 is not None:
            y0 = np.concatenate([np.asarray(y0), np.zeros(m_pad - m)])
        c = jax.device_put(np.asarray(c_p, dtype), xvec_s)
        q = jax.device_put(np.asarray(q_p, dtype), yvec_s)
        l = jax.device_put(np.asarray(l_p, dtype), xvec_s)
        u = jax.device_put(np.asarray(u_p, dtype), xvec_s)

    key = jax.random.PRNGKey(seed)
    mask_j = jnp.asarray(mask)
    will_resume = bool(
        resume
        and checkpoint_path
        and os.path.exists(
            str(checkpoint_path)
            if str(checkpoint_path).endswith(".npz")
            else str(checkpoint_path) + ".npz"
        )
    )

    # ---- chunked device loop with host-side wall-clock enforcement ----
    # Latency model (remote-tunnel TPU): every host-blocking fetch costs a
    # fixed ~30 ms round trip regardless of payload size, while dispatch is
    # asynchronous and ~0.2 ms.  Four measures let a small solve complete
    # in ONE host round trip:
    #   1. preprocessing and the first iteration chunk are fused into a
    #      single dispatch (resume and mesh placement are the exceptions);
    #   2. a freshly initialised state is (j=0, RUNNING) by construction,
    #      so no initial probe is fetched;
    #   3. the next chunk is dispatched *before* the previous chunk's probe
    #      is fetched — speculation is exact, because the loop body no-ops
    #      on terminal status, so a speculated chunk on a finished state
    #      returns it unchanged;
    #   4. for small problems the probe IS the full result bundle
    #      (solution, objective, counters): the transfer is
    #      latency-dominated either way, and termination then costs no
    #      extra fetch.
    chunk = cfg.chunk_kkt_init
    planned = 0
    pending = []  # dispatched-but-unprobed chunk states, oldest first
    # Never fuse iterations into the preprocessing dispatch when the wall
    # clock is already spent — the solve must report TIME_LIMIT without
    # first running a full chunk.
    budget_spent = time.perf_counter() - start + time_used >= cfg.time_limit
    fuse_first = mesh is None and not will_resume and not budget_spent
    # NaN = "use the ||c||/||q|| rule" (see eta_omega_of); a float pins
    # the initial primal weight (refinement's near-zero-RHS corrections).
    om0j = jnp.asarray(
        np.nan if omega0 is None else float(omega0), dtype
    )
    if x0 is not None or y0 is not None:
        x0j = jnp.asarray(
            x0 if x0 is not None else np.zeros(op.shape[1]), dtype
        )
        y0j = jnp.asarray(
            y0 if y0 is not None else np.zeros(op.shape[0]), dtype
        )
    if fuse_first:
        planned = min(cfg.max_kkt, chunk)
        chunk = min(chunk * 2, cfg.chunk_kkt_max)
        budget0 = jnp.int32(planned)
        if blocked_allowed(cfg) and jax.default_backend() == "tpu":
            # Blocked loop ON TPU: prepare and the first chunk stay
            # SEPARATE programs.  XLA only keeps a VMEM-resident K across
            # the blocked cycle when the program has no other loops over
            # K — the fused program's Ruiz/power-iteration loops defeat
            # the pinning (measured 5.3k vs 12k it/s on mittelmann-s).
            # Still one host ROUND TRIP: both dispatches are
            # asynchronous, only the probe fetch blocks.  Off-TPU there
            # is no residency to protect, so the fused single program
            # below is better (one compile, one dispatch).
            if x0 is None and y0 is None:
                pb, st = _prepare(op, c, q, l, u, mask_j, key, om0j, cfg)
            else:
                pb, st = _prepare_warm(
                    op, c, q, l, u, mask_j, key, x0j, y0j, om0j, cfg
                )
            st = run_chunk(st, pb, budget0, cfg, aligned=True)
        elif x0 is None and y0 is None:
            pb, st = _prepare_run(op, c, q, l, u, mask_j, key, budget0,
                                  om0j, cfg)
        else:
            pb, st = _prepare_warm_run(
                op, c, q, l, u, mask_j, key, x0j, y0j, budget0, om0j, cfg
            )
        pending.append(st)
    elif x0 is None and y0 is None:
        pb, st = _prepare(op, c, q, l, u, mask_j, key, om0j, cfg)
    else:
        pb, st = _prepare_warm(op, c, q, l, u, mask_j, key, x0j, y0j, om0j,
                               cfg)

    resumed = False
    if will_resume:
        from tpdlp.solver.checkpoint import load_state

        st = load_state(checkpoint_path, dtype=dtype)
        # Re-derive the anchor operator products from the operator: they
        # must equal K @ x_restart / K' @ y_restart (old checkpoints lack
        # them; recomputation is also robust to dtype recasts).
        st = st.replace(
            kx_restart=pb.op.mv(st.x_restart),
            kty_restart=pb.op.rmv(st.y_restart),
        )
        if cfg.step_scheme == "halpern":
            # kkt_first's Halpern semantics (fixed-point-residual baseline)
            # may not match an older checkpoint; zero both so the criterion
            # re-baselines at the next restart (sufficient restarts are
            # simply disabled until then).
            st = st.replace(
                kkt_first=jnp.zeros_like(st.kkt_first),
                fp_res=jnp.zeros_like(st.fp_res),
            )
        resumed = True
    if mesh is not None:
        pb = shard_device_problem(pb, mesh)
        st = shard_state(
            st, mesh,
            layout="flat" if (sparse_mesh or band_mesh) else "2d",
        )

    timed_out = False
    history = [] if log_history else None
    slow_path = checkpoint_path is not None or history is not None or cfg.verbose
    eager = (
        not slow_path
        and op.shape[0] + op.shape[1] <= cfg.eager_fetch_max
    )
    depth = 2 if (cfg.host_speculation and not slow_path) else 1
    use_prev = cfg.step_scheme == "halpern"

    if resumed:
        j_done, status_now = (
            int(v) for v in jax.device_get((st.j, st.status))
        )
        planned = j_done
    else:
        j_done, status_now = 0, int(Status.RUNNING)
    chunk_aligned = not resumed
    bundle = None  # result bundle of the last probed state, when eager

    while status_now == int(Status.RUNNING) and j_done < cfg.max_kkt:
        if time.perf_counter() - start + time_used >= cfg.time_limit:
            timed_out = True
            break
        while len(pending) < depth and planned < cfg.max_kkt:
            planned = min(cfg.max_kkt, planned + chunk)
            chunk = min(chunk * 2, cfg.chunk_kkt_max)
            # Fresh/warm states start at t == 0 and blocked chunks exit at
            # a cycle boundary, so every chunk is aligned except the first
            # one after a resume (arbitrary checkpointed t).
            st = run_chunk(st, pb, jnp.int32(planned), cfg,
                           aligned=chunk_aligned)
            chunk_aligned = True
            pending.append(st)
        if not pending:
            break
        st_probed = pending.pop(0)
        if eager:
            bundle = _fetch_bundle(
                _result_bundle(pb, st_probed, use_prev)
            )
            j_done, status_now = int(bundle[0]), int(bundle[1])
        elif slow_path:
            if checkpoint_path is not None:
                from tpdlp.solver.checkpoint import save_state

                save_state(st_probed, checkpoint_path)
            probe = jax.device_get((
                st_probed.j, st_probed.status, st_probed.k,
                st_probed.n_restarts, st_probed.prim_obj,
                st_probed.primal_res, st_probed.dual_res, st_probed.gap,
                st_probed.eta, st_probed.omega,
            ))
            j_done, status_now = int(probe[0]), int(probe[1])
            rec = {
                "k": int(probe[2]),
                "j": j_done,
                "restarts": int(probe[3]),
                "prim_obj": float(probe[4]),
                "primal_res": float(probe[5]),
                "dual_res": float(probe[6]),
                "gap": float(probe[7]),
                "eta": float(probe[8]),
                "omega": float(probe[9]),
                "time": time.perf_counter() - start + time_used,
            }
            if history is not None:
                history.append(rec)
            if cfg.verbose:
                print(
                    f"[k={rec['k']} j={rec['j']} n={rec['restarts']}] "
                    f"obj={rec['prim_obj']:.6e} rp={rec['primal_res']:.2e} "
                    f"rd={rec['dual_res']:.2e} gap={rec['gap']:.2e}"
                )
        else:
            j_done, status_now = (
                int(v) for v in jax.device_get((st_probed.j, st_probed.status))
            )
        if status_now != int(Status.RUNNING):
            # Speculated successors of a terminal state are identical to it;
            # report the probed state.
            st = st_probed
            pending.clear()

    status = Status(status_now)
    fetch_final = bundle is None or pending
    if timed_out and status == Status.RUNNING:
        status = Status.TIME_LIMIT
        # On timeout `st` is the newest dispatched state (its work is
        # already done on device), which may be ahead of the last probe.
        fetch_final = True
    elif status == Status.RUNNING:
        # KKT budget exhausted: the reference still runs one last residual
        # evaluation that may declare Solved (:148-177).
        st = final_eval(st, pb, cfg)
        fetch_final = True

    # Unscale the solution (x = d_col x_s, y = d_row y_s; reference :158-161)
    # and drop mesh padding.  One batched transfer for the whole result
    # (or zero, when the eager probe already carried it).
    if fetch_final:
        bundle = _fetch_bundle(_result_bundle(pb, st, use_prev))
    (_, st_v, x_np, y_np, obj_v, k_v, n_v, rp_v, rd_v, gap_v) = bundle
    j_v = bundle[0]
    # The device state is authoritative when terminal: an in-flight chunk
    # may have reached SOLVED (or a certificate) just as the host clock
    # expired — report that, not TIME_LIMIT.
    if int(st_v) != int(Status.RUNNING):
        status = Status(int(st_v))
    x_out = np.asarray(x_np)[:n_orig]
    y_out = np.asarray(y_np)[: problem.m]
    # Padded entries have c0 = 0 and x = 0, so the padded dot equals the
    # original objective exactly; the MPS objective-row constant is added
    # on top (verdict r2 item 4: prod06's fixed cost must be reported).
    objective = float(obj_v) + problem.obj_offset

    return SolveResult(
        x=x_out,
        y=y_out,
        objective=objective,
        obj_offset=problem.obj_offset,
        objective_sense=problem.objsense,
        iterations=int(k_v),
        restarts=int(n_v),
        kkt_passes=int(j_v),
        status=status,
        solve_time=time.perf_counter() - start + time_used,
        primal_res=float(rp_v),
        dual_res=float(rd_v),
        gap=float(gap_v),
        history=history,
    )
