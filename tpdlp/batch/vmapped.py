"""Scenario-batched LP solves: many instances per chip via vmap.

The reference solves instances sequentially in a Python loop
(PDLP/main.py:85-162); its only intra-solve batching is the fishnet point
population.  Here the *entire restarted solver* — steps, restarts, scaling,
termination — is vmapped over a stacked batch of LPs, so a fleet of
perturbed instances (the BASELINE "10k perturbed instances" config) runs as
one device program: each PDHG iteration becomes a batched (B, m, n) x (B, n)
matmul on the MXU.

Instances of different shapes are zero-padded to the batch maximum with the
exactness-preserving padding (padded rows are inequality rows with 0 rhs and
0 coefficients — residual contribution min(0,0) = 0; padded variables are
fixed at 0), so padded entries never perturb residual norms or objectives.
Each element keeps its own ineq_mask, scaling diagonals and termination
norms.  Finished instances hold their state (the loop body is a no-op on
terminal status), so the batched while_loop runs until every element
terminates or the shared KKT budget is exhausted.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpdlp.config import SolverConfig, Status
from tpdlp.ops.dense import DenseOp
from tpdlp.problem import (
    DeviceProblem,
    LPProblem,
    _zeroed_at_inf,
    device_problem,
    triplet_transfer_wins,
)
from tpdlp.scaling.ruiz import scale_problem
from tpdlp.solver.loop import (
    final_eval,
    make_body,
    restart_check_gated,
    run_chunk_impl,
)
from tpdlp.solver.solve import SolveResult, default_dtype, eta_omega_of
from tpdlp.solver.state import init_state


def _pad_stack(problems: Sequence[LPProblem], dtype, *, stack_K=True):
    """Stack padded problem data; K is densified ON DEVICE from COO
    triplets when sparse enough (shipping 16 bytes/nnz instead of the
    (B, m, n) dense stack — a 100x+ transfer saving on remote backends).
    `stack_K=False` (shared-operator batches) skips the K stack entirely
    and returns None in its place."""
    m_max = max(p.m for p in problems)
    n_max = max(p.n for p in problems)
    B = len(problems)
    c = np.zeros((B, n_max), dtype)
    q = np.zeros((B, m_max), dtype)
    l = np.zeros((B, n_max), dtype)  # padded vars fixed at 0
    u = np.zeros((B, n_max), dtype)
    mask = np.ones((B, m_max), dtype=bool)  # padded rows: inequality
    coos = []
    for i, p in enumerate(problems):
        if stack_K:
            coos.append(
                p.K.tocoo() if sp.issparse(p.K) else sp.coo_matrix(p.K)
            )
        c[i, : p.n] = p.c
        q[i, : p.m] = p.q
        l[i, : p.n] = p.l
        u[i, : p.n] = p.u
        mask[i, : p.m] = np.arange(p.m) < p.m_ineq
    if not stack_K:
        return None, c, q, l, u, mask

    nnz_total = sum(co.nnz for co in coos)
    if triplet_transfer_wins(
        B * m_max * n_max, nnz_total, dtype, index_bytes=12
    ):
        b_idx = np.concatenate(
            [np.full(co.nnz, i, np.int32) for i, co in enumerate(coos)]
        )
        rows = np.concatenate([co.row for co in coos]).astype(np.int32)
        cols = np.concatenate([co.col for co in coos]).astype(np.int32)
        vals = np.concatenate([co.data for co in coos]).astype(dtype)
        K = (
            jnp.zeros((B, m_max, n_max), dtype)
            .at[jnp.asarray(b_idx), jnp.asarray(rows), jnp.asarray(cols)]
            .add(jnp.asarray(vals))
        )
    else:
        Kh = np.zeros((B, m_max, n_max), dtype)
        for i, co in enumerate(coos):
            Kh[i, : co.shape[0], : co.shape[1]] = co.toarray()
        K = jnp.asarray(Kh)
    return K, c, q, l, u, mask


def _pb_axes(pbs):
    """vmap in_axes tree for a shared-operator batch: vector data is
    batched (axis 0), the operator and its scaling diagonals are shared
    (broadcast)."""
    ax = jax.tree.map(lambda _: 0, pbs)
    return dataclasses.replace(ax, op=None, d_row=None, d_col=None)


def _pb_is_shared(pbs) -> bool:
    return pbs.d_col.ndim == 1


def _pb_take(pbs, sel):
    """Index the batch axis, layout-aware: shared-operator batches index
    only the vector leaves (the operator has no batch axis)."""
    if not _pb_is_shared(pbs):
        return jax.tree.map(lambda a: a[sel], pbs)
    keep = {"op", "d_row", "d_col"}
    return dataclasses.replace(
        pbs,
        **{
            f.name: getattr(pbs, f.name)[sel]
            for f in dataclasses.fields(pbs)
            if f.name not in keep
        },
    )


def _shared_K(problems: Sequence[LPProblem]) -> bool:
    """True when every instance has the SAME constraint matrix — the
    perturbed-fleet case (c/q/l/u vary, K fixed).  Identity is checked
    first; structural equality only when the total comparison cost is
    modest."""
    K0 = problems[0].K
    sp0 = sp.issparse(K0)
    nnz0 = K0.nnz if sp0 else K0.size
    if nnz0 * len(problems) > 5 * 10**8:
        return all(p.K is K0 for p in problems[1:])
    C0 = K0.tocsr() if sp0 else np.asarray(K0)
    if sp0:
        C0.sum_duplicates()
    for p in problems[1:]:
        K = p.K
        if K is K0:
            continue
        if sp.issparse(K) != sp0 or K.shape != K0.shape:
            return False
        if sp0:
            C = K.tocsr()
            C.sum_duplicates()
            if (
                C.nnz != C0.nnz
                or not np.array_equal(C.indptr, C0.indptr)
                or not np.array_equal(C.indices, C0.indices)
                or not np.array_equal(C.data, C0.data)
            ):
                return False
        elif not np.array_equal(np.asarray(K), C0):
            return False
    return True


@functools.partial(jax.jit, static_argnames=("cfg",))
def _shared_init(op, c, q, l, u, mask, key, cfg: SolverConfig):
    """Build the shared-operator batch: ONE scaled operator + batched
    vector data.

    Ruiz / Pock-Chambolle diagonals depend only on K, so the fleet shares
    op_s, d_row, d_col and the spectral-norm power iteration; per-element
    state is vectors only.  Each PDHG iteration's per-element SpMV pair
    then fuses into one operator-times-matrix product (matrix-matrix
    PDHG), and HBM holds ONE operator instead of a (B, m, n) stack."""
    op_s, _, _, _, _, d_row, d_col = scale_problem(
        op, c[0], q[0], l[0], u[0],
        method=cfg.scaling,
        ruiz_iters=cfg.ruiz_iters,
        ruiz_eps=cfg.ruiz_eps,
        pc_alpha=cfg.pock_chambolle_alpha,
    )
    scaled = cfg.scaling != "none"
    if scaled:
        c_s = c * d_col
        q_s = q * d_row
        l_s = l / d_col
        u_s = u / d_col
    else:
        c_s, q_s, l_s, u_s = c, q, l, u
    is_neg_inf = jnp.isneginf(l_s)
    is_pos_inf = jnp.isposinf(u_s)
    if cfg.compat_scaled_norms:
        q_norm_term = jnp.linalg.norm(q_s, axis=-1)
        c_norm_term = jnp.linalg.norm(c_s, axis=-1)
    else:
        q_norm_term = jnp.linalg.norm(q, axis=-1)
        c_norm_term = jnp.linalg.norm(c, axis=-1)
    pbs = DeviceProblem(
        op=op_s,
        c=c_s,
        q=q_s,
        l=l_s,
        u=u_s,
        ineq_mask=mask,
        is_neg_inf=is_neg_inf,
        is_pos_inf=is_pos_inf,
        l_dual=_zeroed_at_inf(l_s, is_neg_inf),
        u_dual=_zeroed_at_inf(u_s, is_pos_inf),
        d_row=d_row,
        d_col=d_col,
        c0=c,
        q0=q,
        l0_dual=_zeroed_at_inf(l, is_neg_inf),
        u0_dual=_zeroed_at_inf(u, is_pos_inf),
        q_norm_term=q_norm_term,
        c_norm_term=c_norm_term,
    )
    # Shared eta (power iteration on the one operator); per-element omega
    # from the scaled c/q norm ratio (eta_omega_of's rule, vectorized).
    from tpdlp.solver.power_iteration import spectral_norm_estimate

    eta0 = cfg.eta_safety / spectral_norm_estimate(
        op_s, key, cfg.power_iters
    )
    c_norm = jnp.linalg.norm(c_s, axis=-1)
    q_norm = jnp.linalg.norm(q_s, axis=-1)
    omega0 = jnp.where(
        (q_norm > 1e-6) & (c_norm > 1e-6), c_norm / q_norm,
        jnp.ones_like(c_norm),
    )
    sts = jax.vmap(
        lambda p, om: init_state(p, eta0, om), in_axes=(_pb_axes(pbs), 0)
    )(pbs, omega0)
    return pbs, sts


def _build_one(K, c, q, l, u, mask, key, *, cfg: SolverConfig):
    """Per-element pipeline: scale -> DeviceProblem -> init state."""
    return _build_one_op(DenseOp(K), c, q, l, u, mask, key, cfg=cfg)


def _build_one_op(op, c, q, l, u, mask, key, *, cfg: SolverConfig):
    """`_build_one` over an already-built per-element operator (any LinOp
    layout whose leaves carry the vmapped batch axis)."""
    op_s, c_s, q_s, l_s, u_s, d_row, d_col = scale_problem(
        op, c, q, l, u,
        method=cfg.scaling,
        ruiz_iters=cfg.ruiz_iters,
        ruiz_eps=cfg.ruiz_eps,
        pc_alpha=cfg.pock_chambolle_alpha,
    )
    if cfg.scaling == "none":
        pb = device_problem(
            op_s, c_s, q_s, l_s, u_s, 0, ineq_mask=mask,
            compat_scaled_norms=cfg.compat_scaled_norms,
        )
    else:
        pb = device_problem(
            op_s, c_s, q_s, l_s, u_s, 0,
            d_row=d_row, d_col=d_col, c0=c, q0=q, l0=l, u0=u,
            ineq_mask=mask,
            compat_scaled_norms=cfg.compat_scaled_norms,
        )
    eta0, omega0 = eta_omega_of(pb, key, cfg)
    st = init_state(pb, eta0, omega0)
    return pb, st


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_init(K, c, q, l, u, mask, keys, cfg: SolverConfig):
    return jax.vmap(
        lambda *a: _build_one(*a, cfg=cfg)
    )(K, c, q, l, u, mask, keys)


def _band_stack(problems, dtype, np_dtype, m_max, n_max):
    """Stack DISTINCT banded matrices into one common band-slab layout.

    Every instance is zero-padded to (m_max, n_max) (same
    exactness-preserving padding as the dense stack), built host-side
    into the band-slab layout (`BandOp.from_scipy(host=True)`), and the
    per-group windows are widened to the batch-max width WB so all
    elements share one (B, G, 128, WB) slab array per direction.  A
    group whose window would overrun the padded column count is shifted
    left by whole 128-lane blocks, with its slab content moved right by
    the same amount — the represented matrix is unchanged.

    Returns ((fwd_slabs, fwd_starts), (bwd_slabs, bwd_starts)) as HOST
    numpy arrays plus the padded (m, n); raises ValueError naming the
    first instance whose matrix is not band-like.
    """
    from tpdlp.ops.band import LANES, BandOp

    ops = []
    for p in problems:
        co = p.K.tocoo() if sp.issparse(p.K) else sp.coo_matrix(
            np.asarray(p.K)
        )
        Kp = sp.coo_matrix(
            (co.data, (co.row, co.col)), shape=(m_max, n_max)
        )
        op = BandOp.from_scipy(Kp, dtype, host=True)
        if op is None:
            raise ValueError(
                f"matrix_format='band': instance "
                f"{getattr(p, 'name', '?')!r} is not band-like at the "
                f"padded shape ({m_max} x {n_max}); use matrix_format="
                "'dense' for this fleet"
            )
        ops.append(op)

    def stack(side):
        mats = [getattr(o, side) for o in ops]
        G, R, _ = mats[0].slabs.shape
        WB = max(m_.slabs.shape[2] for m_ in mats)
        n_pad = -(-mats[0].n // LANES) * LANES
        slabs = np.zeros((len(mats), G, R, WB), np_dtype)
        starts = np.zeros((len(mats), G), np.int32)
        for i, m_ in enumerate(mats):
            wb = m_.slabs.shape[2]
            new_start = np.clip(m_.starts, 0, max(0, n_pad - WB))
            shift = m_.starts - new_start  # >= 0, multiples of LANES
            for g in range(G):
                s = int(shift[g])
                slabs[i, g, :, s:s + wb] = m_.slabs[g]
            starts[i] = new_start
        return slabs, starts

    return stack("fwd"), stack("bwd")


@functools.partial(
    jax.jit, static_argnames=("cfg", "m_stack", "n_stack")
)
def _batch_init_band(
    fs, fst, bs, bst, c, q, l, u, mask, keys, cfg: SolverConfig,
    m_stack: int, n_stack: int,
):
    from tpdlp.ops.band import BandOp, _BandMat

    def one(fs, fst, bs, bst, c, q, l, u, mask, key):
        # use_pallas=False: the hand-written kernel is not vmappable; the
        # XLA take+einsum path batches into MXU einsums.
        op = BandOp(
            _BandMat(fs, fst, m_stack, n_stack),
            _BandMat(bs, bst, n_stack, m_stack),
            use_pallas=False,
        )
        return _build_one_op(op, c, q, l, u, mask, key, cfg=cfg)

    return jax.vmap(one)(fs, fst, bs, bst, c, q, l, u, mask, keys)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_chunk(sts, pbs, j_budget, cfg: SolverConfig):
    ax = _pb_axes(pbs) if _pb_is_shared(pbs) else 0
    return jax.vmap(
        lambda s, p: run_chunk_impl(s, p, j_budget, cfg), in_axes=(0, ax)
    )(sts, pbs)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_chunk_sync(sts, pbs, j_budget, cfg: SolverConfig):
    """Lockstep batched chunk: one global while_loop stepping all elements.

    Under vmap a per-element `lax.cond` select-executes BOTH branches for
    every element, so the vmapped per-element loop (`_batch_chunk`) pays the
    restart check's three residual evaluations on *every* iteration.  Here
    the restart check runs only at global `restart_period` boundaries
    (per-element gate: >= restart_period iterations since that element's
    last restart), restoring the 1-SpMV-pair-per-iteration cost model at
    the price of a slightly looser restart cadence (period in
    [restart_period, 2*restart_period) after an element's first restart).
    """
    # Per-element budget gate: elements whose j already reached the budget
    # hold their state (matching element mode's per-element cap) instead of
    # overshooting while slower elements catch up.
    ax = _pb_axes(pbs) if _pb_is_shared(pbs) else 0
    step = jax.vmap(
        lambda s, p: jax.lax.cond(
            s.j < j_budget,
            make_body(p, cfg, include_restart=False),
            lambda x: x,
            s,
        ),
        in_axes=(0, ax),
    )
    restart = jax.vmap(
        lambda s, p: restart_check_gated(p, cfg, s, j_budget=j_budget),
        in_axes=(0, ax),
    )

    def cond(carry):
        sts, _ = carry
        running = sts.status == jnp.int32(Status.RUNNING)
        j_min = jnp.min(jnp.where(running, sts.j, j_budget))
        return running.any() & (j_min < j_budget)

    def body(carry):
        sts, i = carry
        sts = step(sts, pbs)
        sts = jax.lax.cond(
            (i + 1) % cfg.restart_period == 0,
            lambda s: restart(s, pbs),
            lambda s: s,
            sts,
        )
        return sts, i + 1

    sts, _ = jax.lax.while_loop(cond, body, (sts, jnp.int32(0)))
    return sts


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_final(sts, pbs, cfg: SolverConfig):
    def one(s, p):
        return jax.lax.cond(
            s.status == jnp.int32(Status.RUNNING),
            lambda s: final_eval(s, p, cfg),
            lambda s: s,
            s,
        )

    ax = _pb_axes(pbs) if _pb_is_shared(pbs) else 0
    return jax.vmap(one, in_axes=(0, ax))(sts, pbs)


def _gather_results(sts, pbs, idx, cfg):
    """Fetch result data for the given batch slots in ONE transfer."""
    sel = jnp.asarray(np.asarray(idx, np.int32))
    use_prev = cfg.step_scheme == "halpern"
    # Index first: |sel| x n work, not full-batch elementwise products.
    # Shared-operator batches carry ONE (n,)/(m,) diagonal pair —
    # broadcast instead of indexing.
    d_col = pbs.d_col[sel] if pbs.d_col.ndim == 2 else pbs.d_col
    d_row = pbs.d_row[sel] if pbs.d_row.ndim == 2 else pbs.d_row
    x = d_col * (sts.x_prev if use_prev else sts.x)[sel]
    y = d_row * (sts.y_prev if use_prev else sts.y)[sel]
    return jax.device_get((
        x, y, pbs.c0[sel],
        sts.status[sel], sts.k[sel], sts.n_restarts[sel], sts.j[sel],
        sts.primal_res[sel], sts.dual_res[sel], sts.gap[sel],
    ))


_MIN_COMPACT = 8  # don't compact below this batch size
#: Only compact when the last chunk took at least this long (seconds):
#: a compaction event costs ~100 ms of host round trips + gathers.
_COMPACT_MIN_CHUNK_WALL = 0.5


def solve_batch(
    problems: Sequence[LPProblem],
    config: SolverConfig = SolverConfig(),
    *,
    dtype=None,
    seed: int = 0,
    restart_sync: str = "element",
    compact: bool = True,
    matrix_format: str = "dense",
    shared_operator: str | bool = "auto",
) -> list[SolveResult]:
    """Solve a batch of LPs as one vmapped device program.

    `shared_operator` ("auto" | True | False): when every instance has the
    SAME constraint matrix (a perturbed fleet — c/q/l/u vary, K fixed),
    the batch shares ONE operator: scaling diagonals and the spectral-norm
    power iteration run once, HBM holds a single operator instead of a
    (B, m, n) stack, and each iteration's per-element SpMV pair fuses into
    one operator-times-matrix product.  "auto" detects the case; True
    asserts it (error if matrices differ); False forces per-element dense.

    `matrix_format` ("dense" | "sparse" | "band" | "auto"): operator
    layout for the shared-operator path (any LinOp layout vmaps over the
    batched vectors).  Per-element distinct-K batches support "dense"
    and "band" — distinct banded matrices stack into one common
    (B, G, 128, WB) slab layout (windows widened to the batch max), so a
    banded fleet pays band-layout HBM instead of (B, m, n) dense.
    "auto" on a distinct-K fleet picks band when every instance is
    band-like and the slab stack is materially smaller than dense, else
    dense.  Unstructured per-element sparse stays unsupported: padding
    distinct patterns to a common one forfeits the layout's advantage.

    `restart_sync`:
    - "element" (default): each element fires its restart check on its own
      t % restart_period schedule — trajectories match single `solve` calls
      exactly, but under vmap the check's cost is paid every iteration
      (lax.cond lowers to select).
    - "global": restart checks run at global step boundaries with a
      per-element >= restart_period gate — same algorithm, ~2-3x higher
      fleet throughput; trajectories may differ slightly from single solves
      (looser restart cadence).

    `compact` (straggler mitigation): when at least half the batch has
    terminated at a chunk boundary, finished elements are finalized and the
    batch is compacted to the next power of two of the running count
    (padded with already-finished no-op elements), so the tail of a
    high-variance fleet stops paying full-batch matmuls.  Each distinct
    compacted size compiles its own chunk program (amortised by the
    persistent compilation cache).
    """
    start = time.perf_counter()
    cfg = config
    if restart_sync not in ("element", "global"):
        raise ValueError(f"unknown restart_sync: {restart_sync!r}")
    for p in problems:
        p.validate()
    if dtype is None:
        dtype = default_dtype()
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    from tpdlp.solver.solve import _f64_guard

    m_max = max(p.m for p in problems)
    n_max = max(p.n for p in problems)
    if shared_operator not in ("auto", True, False):
        raise ValueError(f"unknown shared_operator: {shared_operator!r}")
    if isinstance(shared_operator, bool):
        shared = shared_operator
        if shared and not _shared_K(problems):
            raise ValueError(
                "shared_operator=True but the instances' constraint "
                "matrices differ; use shared_operator='auto' or False"
            )
    else:
        shared = len(problems) > 1 and _shared_K(problems)
    if not shared and matrix_format == "auto":
        # Auto for distinct-K fleets: stacked band-slab when every
        # instance is band-like AND the slab stack is materially smaller
        # than the dense stack; dense otherwise.
        try:
            band_probe = _band_stack(problems, dtype, np_dtype, m_max,
                                     n_max)
            slab_elems = band_probe[0][0].size + band_probe[1][0].size
            matrix_format = (
                "band"
                if slab_elems < 0.5 * len(problems) * m_max * n_max
                else "dense"
            )
        except ValueError:
            band_probe = None
            matrix_format = "dense"
    else:
        band_probe = None
    if not shared and matrix_format not in ("dense", "band"):
        raise ValueError(
            f"matrix_format={matrix_format!r} requires a shared-operator "
            "batch (identical K across instances); per-element distinct-K "
            "batches support 'dense', 'band' (common slab shapes after "
            "padding) and 'auto' only"
        )
    if shared:
        from tpdlp.solver.solve import build_device_operator

        # One operator, chosen layout; B x (m+n) vector state.
        _f64_guard(
            m_max * n_max + len(problems) * (m_max + n_max), dtype,
            f"a shared-K {len(problems)} x ({m_max} x {n_max}) LP batch",
        )
        _, c, q, l, u, mask = _pad_stack(problems, np_dtype, stack_K=False)
        op0, *_ = build_device_operator(problems[0], dtype, matrix_format)
        key = jax.random.PRNGKey(seed)
        pbs, sts = _shared_init(
            op0, jnp.asarray(c), jnp.asarray(q), jnp.asarray(l),
            jnp.asarray(u), jnp.asarray(mask), key, cfg,
        )
    elif matrix_format == "band":
        # Distinct banded matrices, one common slab layout: HBM holds
        # (B, G, 128, WB) slabs per direction instead of (B, m, n) dense.
        (fs, fst), (bs, bst) = band_probe or _band_stack(
            problems, dtype, np_dtype, m_max, n_max
        )
        _f64_guard(
            fs.size + bs.size, dtype,
            f"a banded {len(problems)} x ({m_max} x {n_max}) LP batch",
        )
        _, c, q, l, u, mask = _pad_stack(problems, np_dtype, stack_K=False)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(problems))
        pbs, sts = _batch_init_band(
            jnp.asarray(fs), jnp.asarray(fst), jnp.asarray(bs),
            jnp.asarray(bst), jnp.asarray(c), jnp.asarray(q),
            jnp.asarray(l), jnp.asarray(u), jnp.asarray(mask), keys, cfg,
            m_max, n_max,
        )
    else:
        _f64_guard(
            len(problems) * m_max * n_max, dtype,
            f"a {len(problems)} x {m_max} x {n_max} LP batch",
        )
        K, c, q, l, u, mask = _pad_stack(problems, np_dtype)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(problems))
        pbs, sts = _batch_init(
            jnp.asarray(K), jnp.asarray(c), jnp.asarray(q), jnp.asarray(l),
            jnp.asarray(u), jnp.asarray(mask), keys, cfg,
        )

    chunk = cfg.chunk_kkt_init
    chunk_fn = (
        _batch_chunk_sync if restart_sync == "global" else _batch_chunk
    )
    timed_out = False
    orig = np.arange(len(problems))  # original problem index of each slot
    done: dict = {}  # original index -> fetched per-element result tuple
    last_chunk_wall = 0.0
    t_dispatch = None
    while True:
        # One batched transfer per chunk (scalar fetches cost a host round
        # trip each on remote-tunnel TPU backends).  The fetch blocks until
        # the in-flight chunk finishes, so it also measures the chunk wall.
        statuses, js = jax.device_get((sts.status, sts.j))
        if t_dispatch is not None:
            last_chunk_wall = time.perf_counter() - t_dispatch
        running = statuses == int(Status.RUNNING)
        if not running.any() or js[running].min() >= cfg.max_kkt:
            break
        if time.perf_counter() - start >= cfg.time_limit:
            timed_out = True
            break

        n_run = int(running.sum())
        target = max(_MIN_COMPACT, 1 << max(0, (n_run - 1)).bit_length())
        # Compaction costs ~100 ms of host round trips + gather dispatches
        # per event; only worth it when chunks are expensive enough that
        # halving the batch saves more than that.
        if (
            compact
            and target <= len(statuses) // 2
            and last_chunk_wall >= _COMPACT_MIN_CHUNK_WALL
        ):
            fin_idx = np.flatnonzero(~running)
            new_fin = np.asarray(
                [i for i in fin_idx if orig[i] not in done], np.int32
            )
            if new_fin.size:
                vals = _gather_results(sts, pbs, new_fin, cfg)
                for slot_pos, i in enumerate(new_fin):
                    done[int(orig[i])] = tuple(v[slot_pos] for v in vals)
            run_idx = np.flatnonzero(running)
            pad = fin_idx[: target - run_idx.size]  # finished => no-op slots
            sel = np.concatenate([run_idx, pad])
            sel_j = jnp.asarray(sel.astype(np.int32))
            sts = jax.tree.map(lambda a: a[sel_j], sts)
            pbs = _pb_take(pbs, sel_j)
            orig = orig[sel]
            js = js[sel]
            running = running[sel]

        budget = min(cfg.max_kkt, int(js[running].min()) + chunk)
        t_dispatch = time.perf_counter()
        sts = chunk_fn(sts, pbs, jnp.int32(budget), cfg)
        chunk = min(chunk * 2, cfg.chunk_kkt_max)

    if not timed_out:
        # Budget-exhausted elements get the reference's final residual
        # evaluation (may still declare Solved); on timeout they keep
        # RUNNING and are mapped to TIME_LIMIT below.
        sts = _batch_final(sts, pbs, cfg)
    elapsed = time.perf_counter() - start

    # Finalize the remaining slots (skip pad duplicates already recorded).
    rest = np.asarray(
        [i for i in range(len(orig)) if int(orig[i]) not in done], np.int32
    )
    if rest.size:
        vals = _gather_results(sts, pbs, rest, cfg)
        for slot_pos, i in enumerate(rest):
            done[int(orig[i])] = tuple(v[slot_pos] for v in vals)

    results = []
    for gi, p in enumerate(problems):
        (x_row, y_row, c0_row, status_v, k_v, n_v, j_v, rp_v, rd_v,
         gap_v) = done[gi]
        status = Status(int(status_v))
        if timed_out and status == Status.RUNNING:
            status = Status.TIME_LIMIT
        x = x_row[: p.n]
        results.append(
            SolveResult(
                x=np.asarray(x),
                y=np.asarray(y_row[: p.m]),
                objective=float(np.asarray(c0_row[: p.n]) @ x)
                + p.obj_offset,
                obj_offset=p.obj_offset,
                objective_sense=p.objsense,
                iterations=int(k_v),
                restarts=int(n_v),
                kkt_passes=int(j_v),
                status=status,
                solve_time=elapsed,
                primal_res=float(rp_v),
                dual_res=float(rd_v),
                gap=float(gap_v),
            )
        )
    return results
