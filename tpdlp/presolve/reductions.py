"""Presolve: PaPILO-equivalent reductions with a serializable postsolve stack.

Reference analog: the PaPILO round trip (Packages/prepostsolve.py:1-103 and
the pybind11 wrapper Packages/papilo_wrapper.cpp:11-50 — `presolve_mps`
writes a reduced MPS + transformation data, `postsolve_solution` maps the
reduced primal solution back).  This module implements the core reductions
PaPILO applies that matter for LP (SURVEY.md §2.2): empty/singleton rows,
empty columns, fixed-variable removal, dominated columns (duality fixing),
duplicate rows, and singleton-row bound tightening, iterated to a fixpoint —
plus infeasibility/unboundedness detection during reduction.

Postsolve is primal, like the reference's `papilo postsolve -u reduced.sol`
path: the reduced x maps back through (column map, fixed values).  The
postsolve data is a plain dataclass of numpy arrays, serializable with
`save`/`load` (the reference writes a binary transformation file).

A C++ core (tpdlp/presolve/core.cpp, via ctypes) implements the same pass
pipeline for large instances; `presolve(..., backend="cpp")` uses it with
this module as the portable fallback and the correctness oracle.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import scipy.sparse as sp

from tpdlp.config import Status
from tpdlp.problem import LPProblem


def _empty_subst():
    return dict(
        subst_kind=np.zeros(0, np.int8),
        subst_idx=np.zeros(0, np.int64),
        subst_scale=np.zeros(0),
        subst_rhs=np.zeros(0),
        subst_indptr=np.zeros(1, np.int64),
        subst_cols=np.zeros(0, np.int64),
        subst_vals=np.zeros(0),
    )


@dataclasses.dataclass
class PostsolveData:
    """Everything needed to map a reduced primal solution back.

    Applied in this order at postsolve: (1) surviving-column scatter +
    fixed values, (2) the transform stack (free-singleton substitutions and
    parallel-column splits), evaluated in reverse chronological order with
    `cols` in ORIGINAL variable indices.
    """

    n_orig: int
    col_map: np.ndarray  # indices (into original x) of surviving columns
    fixed_idx: np.ndarray  # original indices of eliminated columns
    fixed_val: np.ndarray  # their values
    obj_offset: float  # c_fixed . x_fixed accumulated into the objective
    # Transform stack (CSR-like layout over stack entries), chronological.
    # kind 0 = linear substitution (free column singleton):
    #     x[idx] = (rhs - vals . x[cols]) / scale
    # kind 1 = parallel-column split (idx was merged into cols[0] with
    #     column_idx = scale * column_cols0; rhs = kept var's upper bound
    #     at merge time; vals = [l_idx, u_idx]):
    #     x[idx] = clip((x[cols0] - rhs)/scale, l, u);  x[cols0] -= scale*x[idx]
    subst_kind: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int8)
    )
    subst_idx: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int64)
    )
    subst_scale: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    subst_rhs: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )
    subst_indptr: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int64)
    )
    subst_cols: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int64)
    )
    subst_vals: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0)
    )

    def save(self, path) -> None:
        np.savez(
            path,
            n_orig=self.n_orig,
            col_map=self.col_map,
            fixed_idx=self.fixed_idx,
            fixed_val=self.fixed_val,
            obj_offset=self.obj_offset,
            subst_kind=self.subst_kind,
            subst_idx=self.subst_idx,
            subst_scale=self.subst_scale,
            subst_rhs=self.subst_rhs,
            subst_indptr=self.subst_indptr,
            subst_cols=self.subst_cols,
            subst_vals=self.subst_vals,
        )

    @classmethod
    def load(cls, path) -> "PostsolveData":
        z = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        subst = _empty_subst()
        for k in subst:
            if k in z.files:
                subst[k] = z[k]
        if "subst_kind" not in z.files:
            subst["subst_kind"] = np.zeros(
                len(subst["subst_idx"]), np.int8
            )
        return cls(
            n_orig=int(z["n_orig"]),
            col_map=z["col_map"],
            fixed_idx=z["fixed_idx"],
            fixed_val=z["fixed_val"],
            obj_offset=float(z["obj_offset"]),
            **subst,
        )


@dataclasses.dataclass
class PresolveResult:
    problem: Optional[LPProblem]  # None when status is terminal
    data: PostsolveData
    status: Status  # RUNNING = reduced problem to be solved
    rows_removed: int
    cols_removed: int
    passes: int


def postsolve(x_reduced: np.ndarray, data: PostsolveData) -> np.ndarray:
    """Map the reduced primal solution back to the original variable space
    (reference: papilo_wrapper.cpp:37-45)."""
    x = np.zeros(data.n_orig)
    x[data.col_map] = x_reduced
    x[data.fixed_idx] = data.fixed_val
    # Transform stack in reverse chronological order (later entries may
    # reference variables recovered by earlier reverse steps).
    kinds = data.subst_kind
    for t in range(len(data.subst_idx) - 1, -1, -1):
        s, e = data.subst_indptr[t], data.subst_indptr[t + 1]
        if len(kinds) and kinds[t] == 1:
            # Parallel-column split: recover the dropped variable from the
            # merged one, respecting both original bound boxes.
            j0 = data.subst_cols[s]
            lam = data.subst_scale[t]
            u0 = data.subst_rhs[t]
            lj, uj = data.subst_vals[s], data.subst_vals[s + 1]
            w = x[j0]
            with np.errstate(invalid="ignore"):
                xj = np.clip((w - u0) / lam, lj, uj)
            x[data.subst_idx[t]] = xj
            x[j0] = w - lam * xj
        else:
            x[data.subst_idx[t]] = (
                data.subst_rhs[t]
                - data.subst_vals[s:e] @ x[data.subst_cols[s:e]]
            ) / data.subst_scale[t]
    return x


def _feas_tol(q):
    return 1e-9 * (1.0 + float(np.max(np.abs(q))) if q.size else 1.0)


def presolve(
    problem: LPProblem,
    *,
    max_passes: int = 10,
    backend: str = "python",
) -> PresolveResult:
    """Reduce an LP; returns the reduced problem + postsolve data.

    status RUNNING -> solve `result.problem`, then `postsolve`.
    status PRIMAL_INFEASIBLE / DUAL_INFEASIBLE -> decided during presolve.
    """
    if backend == "cpp":
        from tpdlp.presolve.cpp import presolve_cpp

        return presolve_cpp(problem, max_passes=max_passes)
    if backend != "python":
        raise ValueError(f"unknown presolve backend: {backend!r}")

    K = sp.csr_matrix(
        problem.K.astype(np.float64)
        if sp.issparse(problem.K)
        else np.asarray(problem.K, np.float64)
    )
    c = np.asarray(problem.c, np.float64).copy()
    q = np.asarray(problem.q, np.float64).copy()
    l = np.asarray(problem.l, np.float64).copy()
    u = np.asarray(problem.u, np.float64).copy()
    m, n = K.shape
    is_ineq = np.arange(m) < problem.m_ineq

    # Bookkeeping against ORIGINAL indices.
    orig_cols = np.arange(n)
    fixed_idx: list[int] = []
    fixed_val: list[float] = []
    subst_kind: list[int] = []
    subst_idx: list[int] = []
    subst_scale: list[float] = []
    subst_rhs: list[float] = []
    subst_cols: list[np.ndarray] = []
    subst_vals: list[np.ndarray] = []
    obj_offset = 0.0
    rows_removed = 0
    cols_removed = 0
    status = Status.RUNNING

    def fail(s):
        nonlocal status
        status = s

    passes = 0
    changed = True
    while changed and passes < max_passes and status == Status.RUNNING:
        changed = False
        passes += 1
        K = K.tocsr()
        K.eliminate_zeros()
        m, n = K.shape

        row_nnz = np.diff(K.indptr)
        tol = _feas_tol(q)

        # ---- empty rows ----
        empty = row_nnz == 0
        if empty.any():
            bad_ineq = empty & is_ineq & (q > tol)
            bad_eq = empty & ~is_ineq & (np.abs(q) > tol)
            if bad_ineq.any() or bad_eq.any():
                fail(Status.PRIMAL_INFEASIBLE)
                break
            keep = ~empty
            K = K[keep]
            q = q[keep]
            is_ineq = is_ineq[keep]
            rows_removed += int(empty.sum())
            changed = True
            continue

        # ---- singleton rows -> bounds ----
        singles = np.flatnonzero(row_nnz == 1)
        if singles.size:
            drop_rows = np.zeros(m, dtype=bool)
            for i in singles:
                a = K.data[K.indptr[i]]
                j = K.indices[K.indptr[i]]
                b = q[i]
                if a == 0.0:
                    continue
                v = b / a
                if is_ineq[i]:
                    if a > 0:
                        l[j] = max(l[j], v)
                    else:
                        u[j] = min(u[j], v)
                else:
                    # equality pins the variable
                    l[j] = max(l[j], v)
                    u[j] = min(u[j], v)
                drop_rows[i] = True
            if np.any(l > u + 1e-9 * (1 + np.abs(u))):
                fail(Status.PRIMAL_INFEASIBLE)
                break
            keep = ~drop_rows
            K = K[keep]
            q = q[keep]
            is_ineq = is_ineq[keep]
            rows_removed += int(drop_rows.sum())
            changed = True
            continue

        # ---- fixed variables (l == u) and empty columns ----
        Kc = K.tocsc()
        col_nnz = np.diff(Kc.indptr)
        with np.errstate(invalid="ignore"):
            fixed = np.isfinite(u) & (l >= u - 1e-12 * (1 + np.abs(u)))
        empty_col = (col_nnz == 0) & ~fixed
        if empty_col.any():
            for j in np.flatnonzero(empty_col):
                if c[j] > 0:
                    if np.isneginf(l[j]):
                        fail(Status.DUAL_INFEASIBLE)
                        break
                    v = l[j]
                elif c[j] < 0:
                    if np.isposinf(u[j]):
                        fail(Status.DUAL_INFEASIBLE)
                        break
                    v = u[j]
                else:
                    v = l[j] if np.isfinite(l[j]) else (
                        u[j] if np.isfinite(u[j]) else 0.0
                    )
                l[j] = u[j] = v
            if status != Status.RUNNING:
                break
            with np.errstate(invalid="ignore"):
                fixed = np.isfinite(u) & (l >= u - 1e-12 * (1 + np.abs(u)))

        if fixed.any():
            vals = 0.5 * (l[fixed] + u[fixed])
            # Substitute: q -= K[:, fixed] @ vals ; objective offset.
            q = q - Kc[:, fixed] @ vals
            obj_offset += float(c[fixed] @ vals)
            fixed_idx.extend(orig_cols[fixed].tolist())
            fixed_val.extend(vals.tolist())
            keep_cols = ~fixed
            K = Kc[:, keep_cols].tocsr()
            c = c[keep_cols]
            l = l[keep_cols]
            u = u[keep_cols]
            orig_cols = orig_cols[keep_cols]
            cols_removed += int(fixed.sum())
            changed = True
            continue

        # ---- dominated columns (duality fixing; PaPILO's DualFix) ----
        # A column with no equality-row entries whose inequality entries all
        # share one sign admits a one-sided dual bound: with rows G x >= h
        # (dual y >= 0) the reduced cost lambda_j = c_j - sum_i a_ij y_i is
        # >= c_j when all a_ij <= 0, so c_j >= 0 forces x_j to its lower
        # bound; symmetrically c_j <= 0 with all a_ij >= 0 forces the upper
        # bound.  An infinite forced bound with strict cost sign certifies
        # dual infeasibility.
        Kc2 = K.tocsc()
        n = Kc2.shape[1]
        col_ids = np.repeat(np.arange(n), np.diff(Kc2.indptr))
        entry_eq = ~is_ineq[Kc2.indices]
        has_eq = np.bincount(col_ids[entry_eq], minlength=n) > 0
        pos_ineq = np.bincount(
            col_ids[(Kc2.data > 0) & ~entry_eq], minlength=n
        ) > 0
        neg_ineq = np.bincount(
            col_ids[(Kc2.data < 0) & ~entry_eq], minlength=n
        ) > 0
        nonempty = np.diff(Kc2.indptr) > 0
        unfixed = l < u
        cand_lo = ~has_eq & ~pos_ineq & (c >= 0) & nonempty & unfixed
        cand_hi = ~has_eq & ~neg_ineq & (c <= 0) & nonempty & unfixed
        dom = False
        for j in np.flatnonzero(cand_lo):
            if np.isfinite(l[j]):
                u[j] = l[j]
                dom = True
            elif c[j] > 0:
                fail(Status.DUAL_INFEASIBLE)
                break
        if status == Status.RUNNING:
            for j in np.flatnonzero(cand_hi & ~cand_lo):
                if np.isfinite(u[j]):
                    l[j] = u[j]
                    dom = True
                elif c[j] < 0:
                    fail(Status.DUAL_INFEASIBLE)
                    break
        if status != Status.RUNNING:
            break
        if dom:
            changed = True
            continue  # the fixed-variable pass performs the substitution

        # ---- free column singletons in equality rows (substitution) ----
        # A free variable (l = -inf, u = +inf) with a single nonzero, in an
        # equality row, is determined by that row: x_j = (b_i - sum_k a_ik
        # x_k)/a_ij.  Remove row i and column j; fold c_j through the row
        # into the remaining costs.  Primal recovery happens in the
        # postsolve substitution stack (PaPILO's column-singleton family).
        col_nnz3 = np.diff(Kc2.indptr)
        free_col = np.isneginf(l) & np.isposinf(u)
        cand_fs = np.flatnonzero((col_nnz3 == 1) & free_col)
        if cand_fs.size:
            Kr = K.tocsr()
            m = Kr.shape[0]
            row_used = np.zeros(m, dtype=bool)
            drop_row = np.zeros(m, dtype=bool)
            drop_col = np.zeros(Kr.shape[1], dtype=bool)
            for j in cand_fs:
                i = Kc2.indices[Kc2.indptr[j]]
                if is_ineq[i] or row_used[i]:
                    continue
                a_jj = Kc2.data[Kc2.indptr[j]]
                s, e = Kr.indptr[i], Kr.indptr[i + 1]
                vals = Kr.data[s:e]
                if abs(a_jj) < 1e-10 * (1.0 + np.max(np.abs(vals))):
                    continue  # numerically unsafe pivot
                cols = Kr.indices[s:e]
                keep_k = cols != j
                ratio = c[j] / a_jj
                c[cols[keep_k]] -= ratio * vals[keep_k]
                obj_offset += ratio * q[i]
                subst_kind.append(0)
                subst_idx.append(int(orig_cols[j]))
                subst_scale.append(float(a_jj))
                subst_rhs.append(float(q[i]))
                subst_cols.append(orig_cols[cols[keep_k]].copy())
                subst_vals.append(vals[keep_k].copy())
                row_used[i] = True
                drop_row[i] = True
                drop_col[j] = True
            if drop_col.any():
                keep_r = ~drop_row
                keep_c = ~drop_col
                K = Kr[keep_r][:, keep_c]
                q = q[keep_r]
                is_ineq = is_ineq[keep_r]
                c = c[keep_c]
                l = l[keep_c]
                u = u[keep_c]
                orig_cols = orig_cols[keep_c]
                rows_removed += int(drop_row.sum())
                cols_removed += int(drop_col.sum())
                changed = True
                continue

        # ---- parallel (proportional) columns (PaPILO ParallelCols) ----
        # Columns with identical row pattern and proportional values
        # (col_j = lam * col_j0) whose costs are consistent (c_j = lam *
        # c_j0) merge into one variable w = x_j0 + lam * x_j with summed
        # bounds; postsolve splits w back into a feasible (x_j0, x_j) pair
        # via the kind-1 stack entry.  Skipped when the split formula
        # would be ill-defined under infinite bounds.
        Kc5 = K.tocsc()
        n = Kc5.shape[1]
        # Hash by row PATTERN only; candidates in a bucket are compared by
        # value with a relative tolerance (exact bit-keys miss pairs whose
        # proportionality factor rounds, e.g. 1.5 * col).
        sig_c: dict = {}
        drop_col5 = np.zeros(n, dtype=bool)
        merged = False
        for j in range(n):
            s_, e_ = Kc5.indptr[j], Kc5.indptr[j + 1]
            if s_ == e_:
                continue  # empty columns are handled by their own pass
            idx_r = Kc5.indices[s_:e_]
            val_r = Kc5.data[s_:e_]
            lead = val_r[0]
            norm = val_r / lead
            bucket = sig_c.setdefault(idx_r.tobytes(), [])
            j0 = None
            for cand_j, cand_lead, cand_norm in bucket:
                if np.allclose(norm, cand_norm, rtol=1e-12, atol=0.0):
                    j0, lead0 = cand_j, cand_lead
                    break
            if j0 is None:
                bucket.append((j, lead, norm))
                continue
            lam = lead / lead0  # col_j = lam * col_j0
            if abs(c[j] - lam * c[j0]) > 1e-12 * (1.0 + abs(c[j])):
                continue  # costs inconsistent: not mergeable
            ok = (
                np.isfinite(u[j0])
                or (lam > 0 and np.isfinite(l[j]))
                or (lam < 0 and np.isfinite(u[j]))
            )
            if not ok:
                continue
            subst_kind.append(1)
            subst_idx.append(int(orig_cols[j]))
            subst_scale.append(float(lam))
            subst_rhs.append(float(u[j0]))
            subst_cols.append(
                np.array([orig_cols[j0], orig_cols[j0]], dtype=np.int64)
            )
            subst_vals.append(np.array([l[j], u[j]], dtype=np.float64))
            if lam > 0:
                l[j0] = l[j0] + lam * l[j]
                u[j0] = u[j0] + lam * u[j]
            else:
                l[j0] = l[j0] + lam * u[j]
                u[j0] = u[j0] + lam * l[j]
            drop_col5[j] = True
            merged = True
        if merged:
            keep_c = ~drop_col5
            K = Kc5[:, keep_c].tocsr()
            c = c[keep_c]
            l = l[keep_c]
            u = u[keep_c]
            orig_cols = orig_cols[keep_c]
            cols_removed += int(drop_col5.sum())
            changed = True
            continue

        # ---- duplicate rows (identical pattern, proportional values) ----
        K = K.tocsr()
        m = K.shape[0]
        if m > 1:
            # Hash rows by (pattern, values normalised by first nonzero).
            sig: dict = {}
            drop_rows = np.zeros(m, dtype=bool)
            for i in range(m):
                s, e = K.indptr[i], K.indptr[i + 1]
                idx = K.indices[s:e]
                val = K.data[s:e]
                lead = val[0]
                key = (idx.tobytes(), (val / lead).tobytes())
                if key in sig:
                    i0, lead0 = sig[key]
                    lam = lead / lead0  # row_i = lam * row_i0
                    if is_ineq[i] and is_ineq[i0] and lam > 0:
                        q[i0] = max(q[i0], q[i] / lam)
                        drop_rows[i] = True
                    elif not is_ineq[i] and not is_ineq[i0]:
                        if abs(q[i] / lam - q[i0]) > tol:
                            fail(Status.PRIMAL_INFEASIBLE)
                            break
                        drop_rows[i] = True
                else:
                    sig[key] = (i, lead)
            if status != Status.RUNNING:
                break
            if drop_rows.any():
                keep = ~drop_rows
                K = K[keep]
                q = q[keep]
                is_ineq = is_ineq[keep]
                rows_removed += int(drop_rows.sum())
                changed = True

    indptr = np.zeros(len(subst_idx) + 1, np.int64)
    if subst_idx:
        indptr[1:] = np.cumsum([len(a) for a in subst_cols])
    data = PostsolveData(
        n_orig=problem.n,
        col_map=orig_cols,
        fixed_idx=np.asarray(fixed_idx, dtype=np.int64),
        fixed_val=np.asarray(fixed_val),
        obj_offset=obj_offset,
        subst_kind=np.asarray(subst_kind, dtype=np.int8),
        subst_idx=np.asarray(subst_idx, dtype=np.int64),
        subst_scale=np.asarray(subst_scale),
        subst_rhs=np.asarray(subst_rhs),
        subst_indptr=indptr,
        subst_cols=(
            np.concatenate(subst_cols).astype(np.int64)
            if subst_cols else np.zeros(0, np.int64)
        ),
        subst_vals=(
            np.concatenate(subst_vals) if subst_vals else np.zeros(0)
        ),
    )

    if status != Status.RUNNING:
        return PresolveResult(None, data, status, rows_removed, cols_removed,
                              passes)

    if K.shape[1] == 0 and K.shape[0] == 0:
        # Fully reduced: the presolver solved the LP; the solution is
        # entirely in the postsolve data.
        return PresolveResult(
            None, data, Status.SOLVED, rows_removed, cols_removed, passes
        )

    # Re-stack so inequality rows stay a prefix (reductions preserve order
    # within each block, but removals may interleave — enforce the invariant).
    K = K.tocsr()
    order = np.argsort(~is_ineq, kind="stable")
    K = K[order]
    q = q[order]
    m_ineq = int(is_ineq.sum())

    reduced = LPProblem(
        c=c, K=K, q=q, m_ineq=m_ineq, l=l, u=u,
        name=problem.name + "+presolved",
        obj_offset=problem.obj_offset + obj_offset,
    )
    return PresolveResult(
        reduced, data, Status.RUNNING, rows_removed, cols_removed, passes
    )
