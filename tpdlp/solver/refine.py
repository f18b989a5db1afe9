"""Iterative refinement: 1e-8+ solves from pure-fp32 device iterations.

TPU MXUs have no native fp64; the XLA-emulated path is ~50x slower per
KKT pass and this backend faults outright on emulated-fp64 solver
programs above a few million matrix elements (solve.py::_F64_DENSE_ELEM_
LIMIT).  Instead of escalating the iterate dtype, this module escalates
the *coordinate frame*: it alternates fast fp32 PDHG solves on the device
with an fp64 outer loop on the host that measures true residuals and
re-centers the problem around the incumbent (Gleixner, Steffy & Wolter,
"Iterative Refinement for Linear Programming", INFORMS J. Comp. 2016,
adapted to the PDLP standard form and a first-order inner solver).

Refinement must run in the all-equality computational form
    min c'x + 0'w   s.t.  G x - w = h,  A x = b,  l <= x <= u,  w >= 0
because Gleixner's recovery maps row duals by SHIFT (y = y^ + e/a_d,
valid only for free/equality duals) and bound duals by SCALE
(z = z~/a_d, which preserves the complementarity kinks at zero).  A
shifted recovery of a cone-constrained inequality dual would move its
complementarity kink away from zero — that variant (tried first) refines
the primal but leaves the dual frozen.  So inequality rows get explicit
slack columns for the CORRECTION solves only; stage 1 still runs the
original inequality-native form.

One round, given the incumbent (x^, y^) in host fp64 and w^ =
max(G x^ - h, 0):

  c~ = a_d ([c; 0] - K_aug' y^)        (= a_d [(c - K'y^); y^_ineq])
  q~ = a_p [h - G x^ + w^ ; b - A x^]  (all-equality rhs; O(violation))
  d_x in [a_p(l - x^), a_p(u - x^)] ∩ [-clip, clip]
  d_w in [-a_p w^, +inf) ∩ [-clip, clip]
  solve  min c~'d  s.t.  K_aug d = q~  in fp32 on the device, then
  x^ += d_x/a_p ;  y^ += e/a_d  (all rows; project y^_ineq >= 0).

Corrections are O(1) by construction, so fp32's ~6e-8 relative floor
becomes an ~6e-8/a absolute floor that shrinks every round — tolerances
far below fp32 at fp32 speed, with no fp64 on the device at all and no
problem-size ceiling.  K_aug never changes, so the device operator and
compiled programs are reused across rounds (solve(op_cache=...)).  The
inner solves run under a per-round work budget and may stop at
KKT_LIMIT: whatever they achieved still multiplies the outer precision
(zoom-frame residuals map back divided by a_p resp. a_p*a_d); the fp64
outer measurement is the only judge of progress.

Termination is measured on the host in fp64 against the ORIGINAL problem
data with exactly the reference's relative criteria
(PDLP/helpers.py:110-128); statuses and KKT accounting match the
reference conventions (each round's host SpMV pair counts one pass).
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np
import scipy.sparse as sp

from tpdlp.config import SolverConfig, Status

#: TPDLP_REFINE_DEBUG=1: phase-level timing prints (round headers,
#: polish, inner solves, folds) for diagnosing large-instance runs.
_DEBUG = os.environ.get("TPDLP_REFINE_DEBUG", "") == "1"


def _dbg(msg):
    if _DEBUG:
        print(f"[refine {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _project_lambda_box(grad, neg_inf_l, pos_inf_u):
    """Host fp64 twin of solver.helpers' dual-cone projection
    (reference PDLP/helpers.py:3-39)."""
    lam = np.where(neg_inf_l & pos_inf_u, 0.0, grad)
    lam = np.where(neg_inf_l & ~pos_inf_u, np.minimum(lam, 0.0), lam)
    lam = np.where(~neg_inf_l & pos_inf_u, np.maximum(lam, 0.0), lam)
    return lam


@dataclasses.dataclass
class _HostResiduals:
    primal_res: float
    dual_res: float
    gap: float
    prim_obj: float
    adjusted_dual: float
    lam: np.ndarray
    rp_vec: np.ndarray  # q - K x (raw, before inequality clamping)
    rd_vec: np.ndarray  # (c - K'y) - lambda


def host_residuals(K, c, q, l, u, m_ineq, x, y) -> _HostResiduals:
    """fp64 residuals/gap of the original problem (helpers.py:53-96)."""
    kx = K @ x
    kty = K.T @ y
    grad = c - kty
    neg_inf_l = np.isneginf(l)
    pos_inf_u = np.isposinf(u)
    lam = _project_lambda_box(grad, neg_inf_l, pos_inf_u)
    full_res = q - kx
    res = np.concatenate([
        np.maximum(full_res[:m_ineq], 0.0),  # G x >= h: only violations
        full_res[m_ineq:],
    ])
    l_dual = np.where(neg_inf_l, 0.0, l)
    u_dual = np.where(pos_inf_u, 0.0, u)
    prim_obj = float(c @ x)
    adjusted_dual = float(
        q @ y + l_dual @ np.maximum(lam, 0.0) + u_dual @ np.minimum(lam, 0.0)
    )
    return _HostResiduals(
        primal_res=float(np.linalg.norm(res)),
        dual_res=float(np.linalg.norm(grad - lam)),
        gap=adjusted_dual - prim_obj,
        prim_obj=prim_obj,
        adjusted_dual=adjusted_dual,
        lam=lam,
        rp_vec=full_res,
        rd_vec=grad - lam,
    )


def _terminated(res: _HostResiduals, q_norm, c_norm, tol, abs_gap):
    gap = abs(res.gap) if abs_gap else res.gap
    return (
        res.primal_res <= tol * (1.0 + q_norm)
        and res.dual_res <= tol * (1.0 + c_norm)
        and gap <= tol * (1.0 + abs(res.prim_obj) + abs(res.adjusted_dual))
    )


def _slack_form(K64, m_ineq):
    """[G, -I; A, 0] with the input's density preserved."""
    m, _ = K64.shape
    if m_ineq == 0:
        return K64
    if sp.issparse(K64):
        neg_i = -sp.eye(m_ineq, format="csr")
        zero = sp.csr_matrix((m - m_ineq, m_ineq))
        return sp.hstack(
            [K64, sp.vstack([neg_i, zero], format="csr")], format="csr"
        )
    W = np.zeros((m, m_ineq))
    W[:m_ineq, :] = -np.eye(m_ineq)
    return np.hstack([K64, W])


def _slack_form_banded(K64, m_ineq):
    """Band-preserving slack form: [G, -I; A, 0] with each slack column
    INTERLEAVED next to its row's own band columns.

    Appending the -I block as trailing columns puts column n+i into row
    i's group window, stretching every group's column span to ~n and
    breaking the band layout — the round-4 downgrade at this site forced
    100k x 100k banded corrections onto the generic gather-bound sparse
    path.  A column permutation is free: slot slack column i at the
    center of inequality row i's nonzero-column range, and each group's
    window only widens by the local slack density (the slack block is
    itself perfectly structured — one diagonal entry per row).

    Returns (K_perm, cols) with K_perm = K_aug[:, cols] verified
    band-like in both directions, or None (caller keeps the plain form
    and downgrades the format).
    """
    if not sp.issparse(K64) or m_ineq == 0:
        return None
    from tpdlp.ops.band import band_stored_elems

    n = K64.shape[1]
    coo = K64.tocoo()
    mask = coo.row < m_ineq
    lo = np.full(m_ineq, n, dtype=np.int64)
    hi = np.zeros(m_ineq, dtype=np.int64)
    np.minimum.at(lo, coo.row[mask], coo.col[mask])
    np.maximum.at(hi, coo.row[mask], coo.col[mask])
    lo = np.minimum(lo, hi)  # empty rows -> 0
    # Sort key in original-column coordinates; slack i sits a half-step
    # after its row's band center (stable sort keeps original columns
    # in order).
    key = np.concatenate([
        np.arange(n, dtype=np.float64), (lo + hi) / 2.0 + 0.5,
    ])
    cols = np.argsort(key, kind="stable")
    K_perm = _slack_form(K64, m_ineq).tocsc()[:, cols].tocsr()
    if band_stored_elems(K_perm) is None:
        return None
    return K_perm, cols


def _elastic_form(K_aug):
    """[K_aug, +I_m, -I_m]: two-sided penalty ELASTIC columns per row.

    Used on the retry path when a plain correction makes no accepted
    progress: aggressive active-set pins plus the +-clip windows can make
    a zoomed correction INFEASIBLE (observed on mittelmann-s: HiGHS
    status 2), which sends the inner PDHG on an endless grind.  Elastics
    (cost refine_dual_cap, bounds [0, clip]) absorb any such conflict —
    a wrong pin shows up as a positive elastic instead of infeasibility —
    and bound the correction's row duals by the elastic cost.  They also
    slow the well-posed case down (2m extra columns, inflated ||c~||),
    which is why the plain form is tried first."""
    m = K_aug.shape[0]
    if sp.issparse(K_aug):
        eye = sp.eye(m, format="csr")
        return sp.hstack([K_aug, eye, -eye], format="csr")
    eye = np.eye(m)
    return np.hstack([K_aug, eye, -eye])


def _active_set_polish(K64, c, q, l, u, m_ineq, xh, yh, res,
                       q_norm, c_norm, tol, *, eps_rel, gap_target=0.0,
                       max_passes=16, max_outer=3, max_matvecs=np.inf,
                       skip_signature=None, incumbent_val=-np.inf):
    """Crossover-style host-fp64 polish of the incumbent pair.

    First-order iterates approach the optimal face geometrically slowly
    in the GAP even when feasibility is tight (PDHG's known tail).  Once
    the incumbent is close, its support identifies the optimal active
    set; conditioned on that guess the optimality system is LINEAR, so a
    least-squares solve (LSMR, host fp64) jumps the pair the rest of the
    way — the same finishing move simplex crossover performs after
    barrier.  The guess is only trusted AFTER the fact: the caller folds
    the candidates through the honest fp64 residual guards and tracks
    primal/dual incumbent pools, so a misidentified set costs one
    rejected attempt, never a regression.

    Structure: up to `max_outer` self-iterations of

      classify -> dual repair -> primal snap+absorb -> reclassify,

    where the RECLASSIFICATION runs on the snapped primal candidate.  A
    PDHG incumbent can converge to the middle of the optimal face, where
    many coordinates sit an ambiguous 1e-4..1e-2 from their bounds and
    no single threshold classifies them (measured on mittelmann-s:
    incumbents from different fold histories, identical residuals, one
    repairable and one not); after one snap+absorb pass the candidate
    sits essentially on a vertex, and the second pass's classification
    is decisive.

    Dual repair (per outer pass): slack inequality rows get y = 0;
    tight/equality rows solve the interior columns' stationarity
    K[tight][:, interior]' y = c[interior] by LSMR, inside a greedy
    degeneracy-repair loop.  Near-degenerate columns (x a hair inside a
    bound whose true multiplier is nonzero, |lambda*| ~ gap-scale) make
    the system inconsistent, and the least-squares residual r0 — which
    lies in null(B) — SPREADS that inconsistency across all interior
    columns; the dual value then loses sum_j dist_j*|r0_j|, which is
    exactly the gap floor the round-3 artifacts froze at (-3.0e-3 on
    mittelmann-s from 3 such columns).  Moves, one per pass, all judged
    by the candidate's TRUE dual value g(y) = q'y + l'lam+ + u'lam-
    (an interior-residual metric alone is blind to the value carried by
    at-bound and dropped columns):

      * column drop — the interior column with the best constraint
        relief per unit gap cost |r0_j|/dist_j moves to the bound its
        residual sign points at (r0_j > 0 means lambda_j > 0, a
        lower-bound column); the analytic optimum of min sum dist|r|
        over the achievable-residual coset when corank(B) = 1.  On the
        mittelmann-s stall this finds exactly the 3 degenerate columns
        in 3 passes (raw-|r0| ranking puts them at position ~760) and
        lands the gap at -1.7e-6, matching the HiGHS optimal dual.
      * row add — slack-side degeneracy is symmetric: a marginally
        slack inequality row whose true dual y*_i > 0 classified out of
        the tight set leaves the system short a degree of freedom no
        column drop restores.  Matching pursuit over rows with slack
        under 1e-2*(1+|q_i|) picks the best residual-correlated row;
        tried whenever the previous move failed to improve the value.
      * row remove — tight inequality rows whose dual comes back
        negative move to the slack set (the end projection would
        silently break stationarity otherwise); a ban list stops
        add/remove cycling.

    Primal (per outer pass): at-bound coordinates (including repaired
    columns) snap exactly to their bound; interior coordinates absorb
    the tight rows' residual via LSMR on the final block.

    Returns (x_cand, y_cand, matvec_count): the best primal candidate
    (by feasibility, then objective) and best dual candidate (by value)
    over all passes — the two sides are independently valid, so they
    need not come from the same pass.
    """
    from scipy.sparse.linalg import lsmr

    m, n = K64.shape
    sparse = sp.issparse(K64)
    Kr = K64.tocsr() if sparse else K64

    span = np.where(np.isfinite(u) & np.isfinite(l), u - l, np.inf)
    neg_inf_l = np.isneginf(l)
    pos_inf_u = np.isposinf(u)
    l_dual = np.where(neg_inf_l, 0.0, l)
    u_dual = np.where(pos_inf_u, 0.0, u)
    matvecs = 0.0

    def _dual_value(y):
        lam = _project_lambda_box(c - K64.T @ y, neg_inf_l, pos_inf_u)
        return float(
            q @ y + l_dual @ np.maximum(lam, 0.0)
            + u_dual @ np.minimum(lam, 0.0)
        )

    best_x = (np.inf, np.inf, xh)   # (primal_res, prim_obj, x)
    best_y = (-np.inf, yh)          # (dual value, y)
    x_work = xh.copy()
    rp_vec = res.rp_vec  # q - K x for the incumbent
    first_sig = None
    prev_sig = None

    for outer in range(max_outer):
        # ---- classification from the current primal point ----
        d_lo = x_work - l
        d_hi = u - x_work
        thr_x = eps_rel * (1.0 + np.abs(x_work))
        at_lo = d_lo <= np.minimum(thr_x, 0.45 * span)
        at_hi = (d_hi <= np.minimum(thr_x, 0.45 * span)) & ~at_lo
        interior = ~(at_lo | at_hi)
        thr_r = eps_rel * (1.0 + np.abs(q))
        slack_ineq = np.zeros(m, dtype=bool)
        slack_ineq[:m_ineq] = rp_vec[:m_ineq] < -thr_r[:m_ineq]
        tight = ~slack_ineq
        # Classification signatures dedup work the repair would redo
        # verbatim (it is deterministic given the sets): the caller's
        # second eps threshold often classifies identically, and a
        # primal snap that lands back on the same sets makes the next
        # outer pass a rerun — measured on mittelmann-s-free, the
        # duplicate passes cost ~8k LSMR-equivalent KKT passes.
        sig = (at_lo.tobytes(), at_hi.tobytes(), slack_ineq.tobytes())
        if outer == 0:
            first_sig = sig
            if skip_signature is not None and sig == skip_signature:
                return None, None, 0, first_sig
        elif sig == prev_sig:
            break
        prev_sig = sig
        if not (int(interior.sum()) and int(tight.sum())):
            break
        slack_amt = np.maximum(-rp_vec[:m_ineq], 0.0) if m_ineq else None
        banned_rows = np.zeros(m_ineq, dtype=bool)
        # The primal snap+absorb must enforce only rows that are tight
        # for the PRIMAL point: the dual repair below may re-add
        # marginally-slack rows to its own tight set (a dual degree of
        # freedom), and forcing K_i x = q_i on a genuinely slack row
        # would push the primal off the feasible set (measured: pres
        # 3e-1 after absorbing a dual-added slack-0.23 row).
        tight_primal = tight.copy()

        def _block():
            return (Kr[tight.nonzero()[0]][:, interior.nonzero()[0]]
                    if sparse else Kr[np.ix_(tight, interior)])

        def _nnz_frac(Bm):
            return (Bm.nnz / max(K64.nnz, 1)) if sparse else (
                Bm.size / max(m * n, 1)
            )

        def _lsmr_iter_cap(Bm):
            """LSMR iteration allowance under the remaining matvec budget
            (each LSMR iteration is one mv + one rmv of Bm).  Returns 0
            when the budget is spent — the polish must stop, not
            overdraw; the KKT budget is a parity contract."""
            rem = max_matvecs - matvecs
            if not np.isfinite(rem):
                return 20000
            if rem <= 0:
                return 0
            return int(min(20000, max(1.0, rem / max(
                2.0 * _nnz_frac(Bm), 1e-12
            ))))

        # ---- dual repair loop ----
        # Warm-start LSMR from the incumbent's dual restricted to the
        # tight rows: the incumbent is already gap-close, so the first
        # solve starts near the least-squares solution instead of zero
        # (measured on mittelmann-s-free: ~4000 cold iterations/pass).
        y_warm = yh[tight]
        no_gain = 0
        pass_val = -np.inf
        B = _block()
        for _ in range(max_passes):
            it_cap = _lsmr_iter_cap(B)
            if it_cap == 0:
                break  # matvec budget spent
            ii = interior.nonzero()[0]
            # atol/btol at fp64 working precision: the value tracking
            # judges the outcome, LSMR just has to get close.  maxiter
            # must reach actual convergence (round 3's 400 returned a
            # 6e-3-residual transient) — subject to the matvec budget.
            out = lsmr(B.T, c[ii], atol=1e-14, btol=1e-14, maxiter=it_cap,
                       x0=y_warm)
            matvecs += 2 * int(out[2]) * _nnz_frac(B)
            y_warm = out[0]
            r0 = c[ii] - B.T @ y_warm
            matvecs += _nnz_frac(B)
            ti = tight.nonzero()[0]
            # Row remove: negative duals on tight inequality rows.
            neg = np.zeros(m, dtype=bool)
            neg[ti] = y_warm < -1e-9
            neg[m_ineq:] = False
            if int(neg.sum()) and int(neg.sum()) <= max_passes:
                slack_ineq |= neg
                banned_rows |= neg[:m_ineq]
                tight = ~slack_ineq
                B = _block()
                y_warm = yh[tight]
                continue
            y_full = np.zeros(m)
            y_full[ti] = y_warm
            y_full[:m_ineq] = np.maximum(y_full[:m_ineq], 0.0)
            val = _dual_value(y_full)
            matvecs += 1.0
            if val > best_y[0]:
                best_y = (val, y_full)
            first_val = pass_val == -np.inf
            if val > pass_val:
                pass_val = val
                no_gain = 0
            else:
                no_gain += 1
            if int(out[2]) >= it_cap and val < incumbent_val \
                    and _lsmr_iter_cap(B) > 0:
                # LSMR hit its iteration cap without beating the
                # incumbent: the solve is UNCONVERGED, so neither the
                # hopeless verdict nor a greedy move is justified (a
                # transient r0 mis-ranks the drops — round 3 measured a
                # 400-iteration transient at 6e-3 residual).  Continue
                # the same system from the warm start (one more pass,
                # still under the matvec budget).
                _dbg(f"polish-dual[{outer}]: cap-hit at {int(out[2])} "
                     f"(normr={float(out[3]):.2e}); continuing warm")
                continue
            if first_val and val < incumbent_val - 100.0 * max(
                    abs(res.gap), 1e-12):
                # Hopeless classification: the repaired dual's VALUE is
                # orders below the incumbent's — the classified set is
                # garbage (an unripe incumbent), and greedy repair from
                # garbage burned ~20k passes/round on the round-4
                # mittelmann-s-free chip run.  Skip the dual repair
                # (the primal snap below still runs — it measurably
                # ripens the incumbent: pres 1.1e-3 -> 3.9e-5 on the
                # same run's round 0).
                _dbg(f"polish-dual[{outer}]: hopeless "
                     f"(val={val:.6e} incumbent={incumbent_val:.6e} "
                     f"int={len(ii)} tight={int(tight.sum())} "
                     f"normr={float(out[3]):.2e} it={int(out[2])}); "
                     "skipping repair")
                break
            dist = np.where(r0 > 0, d_lo[ii], d_hi[ii])
            # A column with an infinite bound on its residual side can
            # never snap there (a drop would set x_j = +-inf); it
            # contributes nothing attainable to the loss either —
            # inf * |r0| -> inf/nan would disable the loss-based early
            # exit exactly on the mixed-bound instances that need it.
            dist_fin = np.isfinite(dist)
            loss = float(np.sum(np.where(dist_fin, dist, 0.0)
                                * np.abs(r0)))
            _dbg(f"polish-dual[{outer}]: int={len(ii)} "
                 f"tight={int(tight.sum())} normr={float(out[3]):.2e} "
                 f"loss={loss:.3e} val={val:.9e} "
                 f"gap~{res.prim_obj - val:.3e} lsmr_it={int(out[2])}")
            if res.prim_obj - val <= max(gap_target, 1e-12) \
                    or loss <= max(gap_target, 1e-12) \
                    or no_gain >= 3:
                break
            moved = False
            if no_gain >= 1 and m_ineq:
                cand = (slack_ineq[:m_ineq] & ~banned_rows
                        & (slack_amt <= 1e-2 * (1.0 + np.abs(q[:m_ineq]))))
                si = cand.nonzero()[0]
                if len(si):
                    Bs = Kr[si][:, ii]
                    corr = np.abs(Bs @ r0)
                    rnorm = (np.sqrt(Bs.multiply(Bs).sum(axis=1)).A1
                             if sparse else np.linalg.norm(Bs, axis=1))
                    matvecs += _nnz_frac(Bs)
                    score = corr / np.maximum(rnorm, 1e-12)
                    i = int(np.argmax(score))
                    if score[i] > 1e-12:
                        ri = si[i]
                        _dbg(f"polish-addrow: row={ri} "
                             f"score={score[i]:.2e} "
                             f"slack={slack_amt[ri]:.2e}")
                        slack_ineq[ri] = False
                        banned_rows[ri] = True  # one shot per outer pass
                        tight = ~slack_ineq
                        y_warm = yh[tight]
                        moved = True
            if not moved:
                # Drop candidates must have a FINITE bound on the
                # residual side (mask to -inf, not 0: with every finite
                # eff at 0 an unmasked argmax picks an infinite-bound
                # column and the snap explodes to +-inf).
                eff = np.where(
                    dist_fin,
                    np.abs(r0) / np.maximum(dist, 1e-12),
                    -np.inf,
                )
                order = np.argsort(-eff)
                if eff[order[0]] == -np.inf:
                    break  # no droppable column remains
                # Corank > 1 handling: an interior set LARGER than the
                # tight row count is overdetermined by at least
                # (int - tight) columns — dropping them one
                # LSMR-pass-at-a-time burned the round-4 s-free budget
                # (5 excess columns x ~4000 iterations/pass).  Take the
                # count mismatch in ONE pass, plus any further columns
                # whose relief-per-gap-cost is within 2x of the best;
                # the caller's value guards make a wrong bulk drop cost
                # one rejected candidate, same as a wrong single drop.
                over = int(interior.sum()) - int(tight.sum())
                k_bulk = min(max(over, 1), 8)
                take = [int(order[0])]
                for oj in order[1:]:
                    if len(take) >= k_bulk:
                        break
                    if not np.isfinite(eff[oj]) or eff[oj] <= 0:
                        break
                    if len(take) >= max(over, 1) \
                            and eff[oj] < 0.5 * eff[order[0]]:
                        break
                    take.append(int(oj))
                for j in take:
                    cj = ii[j]
                    _dbg(f"polish-drop: col={cj} r0={r0[j]:.2e} "
                         f"dist={dist[j]:.2e}")
                    if r0[j] > 0:
                        at_lo[cj] = True
                    else:
                        at_hi[cj] = True
                    interior[cj] = False
            B = _block()

        # ---- primal snap + absorb on the final column classification,
        # with the PRIMAL row set (see tight_primal above) ----
        x_cand = x_work.copy()
        x_cand[at_lo] = l[at_lo]
        x_cand[at_hi] = u[at_hi]
        if int(interior.sum()):
            ti = tight_primal.nonzero()[0]
            Bp = (Kr[ti][:, interior.nonzero()[0]] if sparse
                  else Kr[np.ix_(tight_primal, interior)])
            it_cap = _lsmr_iter_cap(Bp)
            if it_cap:
                r_t = q[ti] - Kr[ti] @ x_cand
                out = lsmr(Bp, r_t, atol=1e-14, btol=1e-14,
                           maxiter=it_cap)
                matvecs += 2 * int(out[2]) * _nnz_frac(Bp) + 1
                ii = interior.nonzero()[0]
                x_cand[ii] = np.clip(x_cand[ii] + out[0], l[ii], u[ii])
        rp_cand = q - K64 @ x_cand
        matvecs += 1.0
        pres = float(np.linalg.norm(np.concatenate([
            np.maximum(rp_cand[:m_ineq], 0.0), rp_cand[m_ineq:],
        ])))
        pobj = float(c @ x_cand)
        _dbg(f"polish-primal[{outer}]: pres={pres:.2e} pobj={pobj:.9e}")
        if (pres, pobj) < (best_x[0], best_x[1]):
            best_x = (pres, pobj, x_cand)
        if pres > 10.0 * max(res.primal_res, 1e-12):
            break  # the snap is drifting; stop re-feeding it
        x_work = x_cand
        rp_vec = rp_cand
        if res.prim_obj - best_y[0] <= max(gap_target, 1e-12):
            break  # dual already certifies against the incumbent primal

    return best_x[2], best_y[1], int(np.ceil(matvecs)), first_sig


def solve_refined(problem, cfg: SolverConfig, *, solve_fn, **kw):
    """fp32 coarse solve + zoomed-correction refinement rounds to cfg.tol.

    `solve_fn` is tpdlp.solver.solve.solve (passed in to avoid the
    circular import); `kw` forwards seed/matrix_format/mesh/... to the
    inner solves.  Returns a SolveResult in the original frame.
    """
    import jax.numpy as jnp

    from tpdlp.problem import LPProblem
    from tpdlp.solver.solve import SolveResult

    start = time.perf_counter()
    time_used = kw.pop("time_used", 0.0)
    log_history = kw.pop("log_history", False)
    # Checkpointing rides on the coarse stage only: correction problems
    # change shape-compatible data every round, so a resume re-enters at
    # the coarse stage and refinement re-runs (cheap relative to stage 1).
    checkpoint_path = kw.pop("checkpoint_path", None)
    resume = kw.pop("resume", False)
    # Warm starts apply to stage 1 only: correction problems live in the
    # zoomed slack frame, where an original-frame point is meaningless.
    x0 = kw.pop("x0", None)
    y0 = kw.pop("y0", None)

    # Host fp64 view of the original data.
    K = problem.K
    K64 = (K.tocsr().astype(np.float64) if sp.issparse(K)
           else np.asarray(K, dtype=np.float64))
    c = np.asarray(problem.c, dtype=np.float64)
    q = np.asarray(problem.q, dtype=np.float64)
    l = np.asarray(problem.l, dtype=np.float64)
    u = np.asarray(problem.u, dtype=np.float64)
    m_ineq = problem.m_ineq
    m, n = K64.shape
    q_norm = float(np.linalg.norm(q))
    c_norm = float(np.linalg.norm(c))

    kw.setdefault("op_cache", {})
    # Inner solves are judged by this loop's fp64 HOST residuals, so
    # noisy MXU products at tight tolerances are acceptable there —
    # suppress solve()'s explicit-fp32 sparse guard.
    kw["_noisy_products_ok"] = True

    auto = cfg.escalation_scheme == "auto" and cfg.step_scheme == "vanilla"
    base = cfg.replace(adaptive=True) if (auto and not cfg.adaptive) else cfg
    if m * n >= 5e7 and cfg.chunk_kkt_max == SolverConfig().chunk_kkt_max:
        # Large instances: bound each device dispatch to ~10 s — a
        # minute-long dispatch can wedge remote-tunnel backends, and the
        # refinement loop's per-round budgets make many medium chunks
        # free.  Automates round 3's hand --chunk_kkt_max 2000 on
        # mittelmann-l; an explicit user setting is honored as-is.
        base = base.replace(chunk_kkt_max=2000)

    # ---- stage 1: plain fp32 coarse solve, capped at 40% of the
    # global budget.  Refinement re-centers from ANY incumbent, so the
    # coarse stage exists only to hand it a cheap one — but its cost is
    # wildly instance-dependent (mittelmann-l reaches 1e-4 in ~1.3k
    # passes while its 1e-6 target alone burns >100k; round 3 required
    # a hand --escalation_tol 1e-4 for exactly this).  The cap automates
    # that flag: easy instances certify cfg.escalation_tol well inside
    # the slice exactly as before, and a conditioning-hard coarse stage
    # stops at the cap with whatever incumbent it reached — the
    # corrections (each a fresh O(1)-conditioned LP) do the rest.
    # (A tolerance-decade ladder was tried here first and measured
    # WORSE: PDHG restarts make warm starts weak, so each decade re-pays
    # most of the previous one, and an aborted decade still burns its
    # whole slice — mittelmann-s spent 40k where the single capped call
    # spends 17k.) ----
    coarse_tol = max(cfg.escalation_tol, cfg.tol)
    stage_cap = max(int(0.4 * cfg.max_kkt), 1)
    s1 = solve_fn(
        problem, base.replace(tol=coarse_tol, max_kkt=stage_cap),
        dtype=jnp.float32, time_used=time_used, log_history=log_history,
        checkpoint_path=checkpoint_path, resume=resume, x0=x0, y0=y0, **kw,
    )
    if s1.status == Status.KKT_LIMIT:
        _dbg(f"stage1: budget cap {stage_cap} hit before {coarse_tol:g}; "
             "refining from the incumbent")
    elif s1.status != Status.SOLVED:
        # Certificates / time limit are terminal as-is.
        return s1
    k_total, n_total, j_total = s1.iterations, s1.restarts, s1.kkt_passes
    stage1_kkt = j_total
    history = list(s1.history) if s1.history is not None else None
    xh = np.asarray(s1.x, dtype=np.float64)
    yh = np.asarray(s1.y, dtype=np.float64)

    # Corrections run in the all-equality slack form (module docstring).
    K_aug = _slack_form(K64, m_ineq)
    K_aug_plain = K_aug  # unpermuted form: the elastic fallback's base
    K_elastic = None  # built lazily on the first stuck round
    corr_format = kw.pop("matrix_format", "dense")
    corr_cols = None  # band path: permuted aug-column order
    if corr_format == "band":
        banded = _slack_form_banded(K64, m_ineq)
        if banded is not None:
            K_aug, corr_cols = banded
            _dbg("corrections keep the band layout "
                 f"(interleaved slack form, shape={K_aug.shape})")
        else:
            corr_format = "sparse"

    def _result(res, status):
        return SolveResult(
            x=xh,
            y=yh,
            objective=res.prim_obj + problem.obj_offset,
            obj_offset=problem.obj_offset,
            objective_sense=problem.objsense,
            iterations=k_total,
            restarts=n_total,
            kkt_passes=j_total,
            status=status,
            solve_time=time.perf_counter() - start + time_used,
            primal_res=res.primal_res,
            dual_res=res.dual_res,
            gap=res.gap,
            history=history,
        )

    # ---- independent primal/dual incumbent pools.  The primal and dual
    # searches are separable: any primal-feasible x and dual-feasible y
    # form a valid certificate pair regardless of which round produced
    # them, and the gap criterion only needs their VALUES.  Coupling
    # them through one joint score (round 3) discarded near-optimal
    # dual candidates whenever the primal of the same round was still
    # coarse — the polish routinely produces an optimal dual several
    # rounds before the primal settles.  Feasibility gates use the
    # termination criteria themselves, so a certified mixed pair is by
    # construction a Solved pair. ----
    best_pr = None  # (primal_res, prim_obj, x)
    best_du = None  # (dual_res, adjusted_dual, y)

    def _pool_primal(x, pres, pobj):
        nonlocal best_pr
        if pres <= cfg.tol * (1.0 + q_norm):
            if best_pr is None or pobj < best_pr[1]:
                best_pr = (pres, pobj, np.array(x))

    def _pool_dual(y, dres, dval):
        nonlocal best_du
        if dres <= cfg.tol * (1.0 + c_norm):
            if best_du is None or dval > best_du[1]:
                best_du = (dres, dval, np.array(y))

    def _update_pools(x, y, r):
        _pool_primal(x, r.primal_res, r.prim_obj)
        _pool_dual(y, r.dual_res, r.adjusted_dual)

    def _mixed_pair():
        """The cross-round (best-primal, best-dual) pair, if it certifies
        the gap criterion on cached values (no extra SpMV)."""
        if best_pr is None or best_du is None:
            return None
        gap = best_du[1] - best_pr[1]
        g = abs(gap) if cfg.abs_gap_termination else gap
        if g <= cfg.tol * (1.0 + abs(best_pr[1]) + abs(best_du[1])):
            return best_pr[2], best_du[2]
        return None

    alpha_p = 1.0
    alpha_d = 1.0
    # Trust regions on the zooms: shrink when a fold is rejected or
    # unproductive (the zoom outran the incumbent's actual accuracy —
    # e.g. a pin threshold cap/alpha_d below the true reduced-cost noise
    # mispins the active set and the correction goes infeasible), relax
    # again on success.  Note a SOLVED correction delivers the full dual
    # step regardless of alpha_d (e*/alpha_d = Delta-y exactly); alpha_d
    # only sets the attainable precision and the pin threshold, so
    # growing it on measured success loses nothing.
    ap_limit = 1e28
    ad_limit = 1e28
    zc_factor = 1.0  # widens the correction clip window on dual-fold
    # failure (see the zc comment in the round loop)
    round_boost = 1  # doubles the per-round budget on dual-fold failure:
    # the dual fold quality is a steep function of inner passes (measured
    # on the mittelmann-s stall: 20k -> gap 2.6e-3, 30k -> 7.8e-4,
    # 120k -> 6.4e-5 = certified), so a stalled dual needs a BIGGER
    # round, not more small ones (small re-zoomed rounds do not compound
    # — measured: two 20k rounds end where one started).
    om_scale = 1.0  # primal-weight ladder for the correction solves.
    # The solver's omega = ||c||/||q|| rule is catastrophically wrong on
    # corrections BY CONSTRUCTION (c~ is cap-scaled, q~ is
    # residual-scaled: measured ratio 3.5e4 on a mittelmann-s round-1
    # correction, whose 50k-pass fold lands at gap -1.4e-2, vs -6.3e-4
    # at omega=0.03).  Corrections instead start at
    # (alpha_d/alpha_p) * (1+||y||)/(1+||x||) — the zoomed image of the
    # incumbent's own dual/primal scale — and the ladder divides by 10
    # whenever a fold fails to halve the gap (measured certifying zone
    # on the same correction: omega in [0.01, 0.03] at 100k passes,
    # rule value 0.12).
    best = None  # (score, xh, yh, res)
    stall = 0
    res = None
    joint_taken = False  # last round accepted a JOINT fold: its combined
    # score is transiently worse (feasibility regressed by design, to be
    # repaired by the next correction), so the best-score re-centering
    # below must not immediately revert it

    def _score(r):
        return (
            r.primal_res / (1 + q_norm)
            + r.dual_res / (1 + c_norm)
            + abs(r.gap) / (1 + abs(r.prim_obj) + abs(r.adjusted_dual))
        )

    for rnd in range(cfg.refine_max_rounds):
        _dbg(f"round {rnd}: j={j_total} alpha_p={alpha_p:.2e} alpha_d={alpha_d:.2e}")
        np.clip(xh, l, u, out=xh)  # PDHG keeps iterates in the box; keep
        yh[:m_ineq] = np.maximum(yh[:m_ineq], 0.0)  # the fp64 sum there too
        res = host_residuals(K64, c, q, l, u, m_ineq, xh, yh)
        j_total += 1  # the host SpMV pair above is one KKT pass of work
        _update_pools(xh, yh, res)
        score = _score(res)

        # ---- crossover-style active-set polish (host fp64, guarded).
        # Tried each round once the incumbent is in refinement territory;
        # each candidate (joint and per-side folds, two identification
        # thresholds) is accepted only if the honest combined score
        # improves, so a misidentified active set costs one rejected
        # attempt and nothing else. ----
        # Gate: classification needs a near-face incumbent.  From a
        # ~1e-3-feasible point the classified sets are garbage (measured
        # on mittelmann-m: 2500-column "interior", stationarity residual
        # 8.1 — every LSMR pass wasted); 1e-5 admits every incumbent that
        # has ever produced a useful polish and skips the noise.
        if cfg.refine_polish and res.primal_res <= 1e-5 * (1.0 + q_norm) \
                and cfg.max_kkt - j_total > 0:
            _dbg("polish: start")
            gap_target = 0.05 * cfg.tol * (
                1.0 + abs(res.prim_obj) + abs(res.adjusted_dual)
            )
            polish_sig = None
            for eps_rel in (1e-5, 1e-7):
                if cfg.max_kkt - j_total <= 0:
                    break  # budget spent mid-polish
                x_c, y_c, mv, polish_sig = _active_set_polish(
                    K64, c, q, l, u, m_ineq, xh, yh, res, q_norm, c_norm,
                    cfg.tol, eps_rel=eps_rel, gap_target=gap_target,
                    # Matvec allowance from the remaining KKT budget
                    # (one KKT pass == one mv+rmv pair == 2 matvecs).
                    max_matvecs=2.0 * (cfg.max_kkt - j_total),
                    # The second threshold often classifies identically;
                    # the repair is deterministic given the sets, so the
                    # duplicate attempt returns immediately.
                    skip_signature=polish_sig,
                    incumbent_val=res.adjusted_dual,
                )
                j_total += (mv + 1) // 2
                if x_c is None:
                    continue  # identical classification: nothing new
                cand_best = None
                for xx, yy in ((x_c, y_c), (x_c, yh), (xh, y_c)):
                    r2 = host_residuals(K64, c, q, l, u, m_ineq, xx, yy)
                    j_total += 1
                    _update_pools(xx, yy, r2)
                    s2 = _score(r2)
                    if cand_best is None or s2 < cand_best[0]:
                        cand_best = (s2, xx, yy, r2)
                _dbg(f"polish eps={eps_rel:g}: cand={cand_best[0]:.3e} score={score:.3e}")
                if cand_best[0] < score:
                    score, xh, yh, res = cand_best
                    if _terminated(res, q_norm, c_norm, cfg.tol,
                                   cfg.abs_gap_termination):
                        break  # certified; the check below returns
                if _mixed_pair() is not None:
                    break  # cross-round pool certified; checked below
        if history is not None:
            history.append({
                "refine_round": rnd, "j": j_total,
                "primal_res": res.primal_res, "dual_res": res.dual_res,
                "gap": res.gap, "alpha_p": alpha_p, "alpha_d": alpha_d,
            })
        if best is None or score < 0.6 * best[0]:
            stall = 0
        else:
            stall += 1
        if best is None or score < best[0]:
            best = (score, xh.copy(), yh.copy(), res)
        elif score > 4.0 * best[0] and not joint_taken:
            # The last fold regressed; re-center the next round on the
            # best incumbent instead of compounding the damage.  (A
            # joint-fold round is exempt: its feasibility regression is
            # deliberate and the next correction repairs it — measured
            # on mittelmann-m, reverting here re-froze the gap at
            # -4.8e-3 after the joint fold had brought it to -4.4e-4.)
            _, xh, yh, res = best
            xh, yh = xh.copy(), yh.copy()
        joint_taken = False
        if _terminated(res, q_norm, c_norm, cfg.tol,
                       cfg.abs_gap_termination):
            return _result(res, Status.SOLVED)
        pair = _mixed_pair()
        if pair is not None:
            # Cross-round certificate: re-measure the mixed pair honestly
            # before reporting (one host SpMV pair).
            r_mix = host_residuals(K64, c, q, l, u, m_ineq, *pair)
            j_total += 1
            if _terminated(r_mix, q_norm, c_norm, cfg.tol,
                           cfg.abs_gap_termination):
                xh, yh, res = pair[0], pair[1], r_mix
                return _result(r_mix, Status.SOLVED)
        if stall >= 3 and round_boost >= 8:
            break  # three rounds without even a 1.7x combined-score
            # improvement AND the budget-boost ladder is exhausted: the
            # fp32 inner solver has hit its floor on this instance; stop
            # burning budget and report the best incumbent below.
            # (While boosts remain, a "stalled" dual is expected — the
            # next, bigger round is the designed response.)
        if time.perf_counter() - start + time_used >= cfg.time_limit:
            _, xh, yh, res = best
            return _result(res, Status.TIME_LIMIT)
        kkt_left = cfg.max_kkt - j_total
        if kkt_left <= 0:
            _, xh, yh, res = best
            return _result(res, Status.KKT_LIMIT)

        # ---- zoom factors (Gleixner's incremental scales).  The dual
        # zoom tracks BOTH the stationarity violation and the relative
        # gap: for all-finite-box problems the dual residual is
        # identically 0 (lambda == reduced cost), so gap/complementarity
        # is the only dual error signal. ----
        wh = np.maximum(K64[:m_ineq] @ xh - q[:m_ineq], 0.0) \
            if m_ineq else np.zeros(0)
        # The primal zoom must track BOTH the feasibility violation and
        # the OPTIMALITY error (gap in x-units): corrections can only
        # move x by clip/alpha_p, and a gap of g needs x-moves of
        # ~g/||c||.  Zooming on feasibility alone (1e-13 after a few
        # rounds) shrinks the window to ~1e-11 and freezes the incumbent
        # at a feasible-but-suboptimal vertex with the gap stuck.
        gap_xu = abs(res.gap) / (1.0 + c_norm)
        viol_p = max(
            float(np.max(np.maximum(res.rp_vec[:m_ineq], 0.0), initial=0.0)),
            float(np.max(np.abs(res.rp_vec[m_ineq:]), initial=0.0)),
            gap_xu,
        )
        # Gap converted to reduced-cost units (divide by the iterate
        # scale, NOT the objective): the pin threshold cap/alpha_d must
        # stay above the per-component dual noise, or the active-set
        # snaps mispin en masse and the correction LP becomes
        # near-infeasible (observed on mittelmann-s, where the objective
        # ~9e3 made the relative gap look 6 orders smaller than the
        # actual reduced-cost error).
        gap_rc = abs(res.gap) / (1.0 + float(np.linalg.norm(xh)))
        viol_d = max(float(np.max(np.abs(res.rd_vec), initial=0.0)), gap_rc)
        alpha_p = min(
            max(1.0 / max(viol_p, 1e-300), 1.0), alpha_p * cfg.refine_zoom,
            ap_limit,
        )
        alpha_d = min(
            max(1.0 / max(viol_d, 1e-300), 1.0), alpha_d * cfg.refine_zoom,
            ad_limit,
        )

        # ---- correction problem in slack form (host fp64; the inner
        # solve casts to fp32).  Bounds beyond +-clip cannot bind for an
        # O(1) zoomed correction; clipping keeps every scale O(clip),
        # which is what conditions the fp32 inner solve. ----
        # The clip window must cover the incumbent's true distance to the
        # optimal face, and DEGENERACY hides that distance from every
        # residual/gap measure: coordinates whose true multiplier is ~0
        # can sit arbitrarily far (measured 8e-3 on mittelmann-s) while
        # contributing nothing to the gap, and a window that cuts them
        # off makes its artificial bounds active in the correction —
        # which poisons the correction's DUAL outright (measured: the
        # exact HiGHS dual of a zc=100 correction folds to zero gap
        # improvement; zc=1000 folds to gap -3.6e-12).  The primal fold
        # is insensitive to the window (it re-centers every round), so
        # the window widens on measured dual-fold failure (see _attempt)
        # rather than by default.
        if res.primal_res <= cfg.tol * (1.0 + q_norm) and zc_factor < 10.0:
            # Dual-dominant round (primal already certifies): the wide
            # window is measured-necessary for the dual — skip the wasted
            # narrow-window attempt.
            zc_factor = 10.0
        zc = cfg.refine_clip * zc_factor
        kty = K64.T @ yh
        # Gleixner's correction objective is the FULL zoomed reduced-cost
        # vector (x-columns: c - K'y^; slack columns: y^_ineq) — bound
        # duals then recover by pure scaling, which preserves their
        # complementarity kinks at zero.  (Subtracting the projected
        # lambda^ here would zero the objective for all-finite-box
        # problems and delete the dual signal entirely.)
        c_full = np.concatenate([alpha_d * (c - kty),
                                 alpha_d * yh[:m_ineq]])
        # Active-set pinning: |zoomed reduced cost| > cap marks the
        # column confidently nonbasic — SNAP its correction to the zoomed
        # bound the reduced cost points at (crossover-style: the pinned
        # coordinate moves x_j exactly onto l_j/u_j, closing its
        # complementarity-gap contribution; for a slack column the row
        # becomes exactly active with exact shift-recovery of its dual).
        # Pinning to 0 instead would FREEZE each pinned coordinate's
        # remaining distance to its bound, stalling the gap.  This bounds
        # the fp32 correction objective by O(cap) WITHOUT capping
        # alpha_d, which would freeze dual refinement.  A wrong pin only
        # lasts one round: the row/bound dual stays free, so the
        # recomputed reduced cost unpins it next round.
        q_t = alpha_p * res.rp_vec
        if m_ineq:
            q_t[:m_ineq] = alpha_p * (q[:m_ineq] - K64[:m_ineq] @ xh + wh)
        with np.errstate(invalid="ignore"):
            l_t = np.where(np.isneginf(l), -np.inf, alpha_p * (l - xh))
            u_t = np.where(np.isposinf(u), np.inf, alpha_p * (u - xh))
        l_t = np.concatenate([
            np.maximum(l_t, -zc), np.maximum(-alpha_p * wh, -zc),
        ])
        u_t = np.concatenate([
            np.minimum(u_t, zc), np.full(m_ineq, zc),
        ])
        # Pin only when the bound is REACHABLE within the clip window —
        # snapping a distant coordinate a full clip-length on a
        # misclassified sign is a large wrong move.  Unreachable large
        # entries stay free with the objective clamped to +-cap (a
        # bounded distortion that self-corrects as the incumbent nears
        # its bounds).
        reach_lo = l_t > -zc + 1e-12  # strictly inside => bound in reach
        reach_hi = u_t < zc - 1e-12
        pin_lo = (c_full > cfg.refine_dual_cap) & reach_lo
        pin_hi = (c_full < -cfg.refine_dual_cap) & reach_hi
        c_t = np.clip(np.where(pin_lo | pin_hi, 0.0, c_full),
                      -cfg.refine_dual_cap, cfg.refine_dual_cap)
        u_t = np.where(pin_lo, l_t, u_t)  # snap: fix d_j = l~_j
        l_t = np.where(pin_hi, u_t, l_t)  # snap: fix d_j = u~_j
        # Inner tolerance: aim for an ABSOLUTE zoomed residual of
        # refine_round_factor (current violation == 1 in zoom units), as
        # a relative tol against the correction problem's own norms,
        # floored at what fp32 iterates can certify.
        inner_tol = min(
            max(
                cfg.refine_round_factor
                / (1.0 + float(np.linalg.norm(q_t))),
                2e-7,
            ),
            1e-4,
        )
        # Per-round work budget: the zoom-frame GAP has its own fp32
        # floor (~clip * eps * ||c~||), so a correction solve may
        # legitimately end at KKT_LIMIT — whatever it achieved still
        # multiplies the outer precision.  Fold and continue; the fp64
        # outer measurement is the only judge of progress.
        # Auto round budget: 3x the coarse stage, but never below a
        # max_kkt-proportional floor — a cheap coarse stage (e.g. a 1e-4
        # stage-1 on a hard instance) must not starve the corrections
        # (observed on mittelmann-l: 4k-pass rounds left the gap frozen
        # at -0.45 across every round; 30k-pass rounds close it and land
        # the objective 3e-9 from the HiGHS optimum).
        # Early rounds are capped at 45% of the remaining budget so the
        # omega/window ladders always get a second, adapted attempt —
        # an uncapped first round eats the whole budget probing with
        # un-laddered parameters (measured on mittelmann-m at 100k:
        # stage1 25k + one 71k round, nothing left when the ladder
        # kicked in).  Once the ladder has fired twice (boost >= 4) the
        # round may take everything that remains.
        # Both arms clamp to the REMAINING budget: the 4000-pass floor
        # exists to stop round starvation on big-budget runs, not to
        # overdraw small budgets (budget honesty is a parity property —
        # the reference enforces j < max_kkt in both loops,
        # primal_dual_hybrid_gradient.py:54,67).
        cap = (
            kkt_left if round_boost >= 4
            else min(kkt_left, max(int(0.45 * kkt_left), 4000))
        )
        round_kkt = min(
            cap,
            (cfg.refine_round_kkt
             or max(4000, 3 * stage1_kkt, cfg.max_kkt // 12))
            * round_boost,
        )
        inner_cfg = base.replace(
            tol=inner_tol,
            max_kkt=round_kkt,
            # Corrections run vanilla-adaptive with Ruiz+Pock-Chambolle
            # scaling when the user left the scheme at vanilla: measured
            # head-to-head on the mittelmann-s correction (30k passes),
            # the dual fold lands at gap 7.7e-4 under vanilla+ruiz+pc vs
            # 9.9e-4 halpern+ruiz+pc vs 1.1e-3 halpern+ruiz — and
            # ruiz+pc beats plain ruiz under both schemes.  (Halpern
            # remains the fp64-tail policy in _solve_escalated, where it
            # was measured fastest.)
            **(
                {"step_scheme": "vanilla", "adaptive": True,
                 "scaling": "ruiz+pc"}
                if auto
                else {}
            ),
            time_limit=cfg.time_limit - (
                time.perf_counter() - start + time_used
            ),
            # The correction LP is an artificial re-centering: its duality
            # gap can be transiently one-sided, so use |gap| termination.
            abs_gap_termination=True,
            # Exact step products always: inner_tol's 1e-4 cap lands on
            # the step_products="auto" boundary where steps would take
            # the noisy MXU path, and the correction DUAL collapses at
            # that noise floor (measured: a 94k-pass noisy-product round
            # folds to a rejected dual; a 30k exact-product round folds
            # to gap 7.8e-4).
            step_products="exact",
            # Corrections of a feasible/bounded problem are feasible and
            # bounded; ray "certificates" here would only reflect the
            # zoomed frame, so keep the detector off.
            infeasibility_detect=False,
        )
        def _attempt(K_mat, c2, l2, u2, fmt=corr_format, cols=None):
            """One correction solve + guarded fold.  Returns
            (accepted_primal, accepted_dual, inner_status).  `cols`
            (band path) is the aug-column permutation of K_mat: data
            vectors permute in, the correction permutes back out."""
            nonlocal xh, yh, k_total, n_total, j_total, ap_limit, \
                ad_limit, zc_factor, round_boost, om_scale, history, \
                joint_taken
            if cols is not None:
                c2, l2, u2 = c2[cols], l2[cols], u2[cols]
            corr = LPProblem(
                c=c2, K=K_mat, q=q_t, m_ineq=0, l=l2, u=u2,
                name=f"{problem.name}+refine{rnd}",
            )
            # The omega override applies to DUAL-dominant corrections
            # only (primal already certifies; ||q~|| ~ 0 degenerates the
            # solver's norm rule).  Feasibility-repair rounds keep the
            # rule: their q~ is O(1) by construction, the rule value is
            # sane there, and overriding it measurably breaks them
            # (mittelmann-m: the post-joint-fold repair round folded to
            # a REJECTED primal under the override).
            om0 = (
                (alpha_d / alpha_p)
                * (1.0 + float(np.linalg.norm(yh)))
                / (1.0 + float(np.linalg.norm(xh)))
                * om_scale
                if res.primal_res <= 0.5 * cfg.tol * (1.0 + q_norm)
                else None
            )
            _dbg(f"inner solve: shape={K_mat.shape} tol={inner_cfg.tol:.1e} "
                 f"budget={inner_cfg.max_kkt} omega0="
                 + (f"{om0:.3e}" if om0 is not None else "rule"))
            dump = os.environ.get("TPDLP_REFINE_DUMP")
            if dump:
                np.savez(f"{dump}_r{rnd}.npz", c2=c2, q_t=q_t, l2=l2,
                         u2=u2, xh=xh, yh=yh, alpha_p=alpha_p,
                         alpha_d=alpha_d, zc=zc)
            r = solve_fn(corr, inner_cfg, dtype=jnp.float32,
                         matrix_format=fmt, omega0=om0, **kw)
            _dbg(f"inner done: {r.status_string} j={r.kkt_passes} t={r.solve_time:.1f}s")
            k_total += r.iterations
            n_total += r.restarts
            j_total += r.kkt_passes
            if r.history is not None and history is not None:
                history.extend(r.history)
            if r.status not in (Status.SOLVED, Status.KKT_LIMIT,
                                Status.TIME_LIMIT):
                return False, False, r.status
            # Fold with per-side fp64 guards: a budget-stopped inner
            # solve can return a transient (PDHG is non-monotone), and
            # folding a junk dual at 1/alpha_d scale regresses the gap.
            # Cost: one host SpMV pair (counted as a KKT pass).
            d_aug = np.asarray(r.x, dtype=np.float64)
            if cols is not None:
                d_unperm = np.empty_like(d_aug)
                d_unperm[cols] = d_aug
                d_aug = d_unperm
            x_cand = np.clip(xh + d_aug[:n] / alpha_p, l, u)
            y_cand = yh + np.asarray(r.y, dtype=np.float64) / alpha_d
            y_cand[:m_ineq] = np.maximum(y_cand[:m_ineq], 0.0)
            j_total += 1
            rp_new = q - K64 @ x_cand
            rp_new = np.concatenate([np.maximum(rp_new[:m_ineq], 0.0),
                                     rp_new[m_ineq:]])
            pres_new = float(np.linalg.norm(rp_new))
            pobj_new = float(c @ x_cand)
            _pool_primal(x_cand, pres_new, pobj_new)
            # Accept a primal fold that improves FEASIBILITY — or one
            # that improves the OBJECTIVE while staying comfortably
            # inside the feasibility criterion.  Feasibility-monotone
            # acceptance alone freezes the incumbent at the first
            # 1e-13-feasible point it reaches: no correction can beat
            # that residual, so a feasible-but-suboptimal x re-centers
            # every subsequent round on itself (measured on
            # mittelmann-m: pres 1.8e-13 with the OBJECTIVE stuck
            # 2.7e-3 high and the dual already optimal — the exact
            # mirror of the dual-side freeze).
            ok_p = pres_new <= res.primal_res or (
                pres_new <= 0.5 * cfg.tol * (1.0 + q_norm)
                and pobj_new < res.prim_obj
            )
            if ok_p:
                xh = x_cand
                ap_limit = min(ap_limit * 4.0, 1e28)
            else:
                # The zoomed window cut off the true correction; widen it
                # (in absolute terms) by zooming less next round.
                ap_limit = max(alpha_p / 8.0, 1.0)
            grad_new = c - K64.T @ y_cand
            lam_new = _project_lambda_box(
                grad_new, np.isneginf(l), np.isposinf(u)
            )
            l_dual = np.where(np.isneginf(l), 0.0, l)
            u_dual = np.where(np.isposinf(u), 0.0, u)
            d_new = float(
                q @ y_cand + l_dual @ np.maximum(lam_new, 0.0)
                + u_dual @ np.minimum(lam_new, 0.0)
            )
            rd_new = float(np.linalg.norm(grad_new - lam_new))
            _pool_dual(y_cand, rd_new, d_new)
            # Accept the dual if it tightens |gap| against the (possibly
            # just updated) primal point without materially worsening
            # stationarity.
            prim_new = float(c @ xh)
            gap_old = abs(res.adjusted_dual - prim_new)
            gap_new = abs(d_new - prim_new)
            ok_d = (
                gap_new <= gap_old
                and rd_new <= max(res.dual_res, cfg.tol * (1 + c_norm))
            )
            if ok_d:
                yh = y_cand
            if ok_d and gap_new <= 0.5 * gap_old:
                ad_limit = min(ad_limit * 8.0, 1e28)
            elif ok_d:
                # Accepted but didn't halve: the window is demonstrably
                # adequate (it admitted an improving dual) — the inner
                # solve was just too short.  Fold quality is a steep
                # function of inner passes (measured: 20k -> gap 2.6e-3,
                # 30k -> 7.8e-4, 120k -> certified), so double the next
                # round's budget and leave the window alone (widening on
                # slow-but-real progress is how zc overshot to 1e4,
                # where the huge box measurably poisons the inner solve:
                # a 94k-pass zc=1e4 correction folds to a REJECTED dual
                # while zc=1e3 certifies).
                round_boost = min(round_boost * 2, 8)
                om_scale = max(om_scale / 10.0, 1e-3)
            else:
                # Rejected outright: two measured causes, both countered.
                # (1) The clip window cutting off far degenerate
                # coordinates makes artificial window bounds active and
                # poisons the correction's DUAL (the exact HiGHS dual of
                # a zc=100 correction folds to zero gap improvement;
                # zc=1000 folds to gap -3.6e-12 on the same incumbent) —
                # widen, capped at 100x (1000x measurably overshoots,
                # see above).  (2) The inner solve was too short —
                # double the next round's budget.  Keep the dual zoom:
                # round 3's alpha_d/64 backoff here nuked the zoom
                # precisely when the dual needed it (alpha_d fell
                # 7.8e4 -> 18 across rounds while the gap froze).
                zc_factor = min(zc_factor * 10.0, 100.0)
                round_boost = min(round_boost * 2, 8)
                om_scale = max(om_scale / 10.0, 1e-3)
            if not (ok_p and ok_d):
                # JOINT acceptance: the pair (x_cand, y_cand) can close
                # most of the gap TOGETHER while failing both per-side
                # guards — measured on mittelmann-m: joint fold gap
                # -8e-5 (certifying scale) with pres 5.4e-5, where the
                # primal guard rejects (feasibility regressed from
                # 1.8e-13) and the dual-only fold against the OLD x
                # shows -2.9e-3.  A 5e-5 feasibility error is exactly
                # what the next round's correction repairs in one cheap
                # solve, whereas the old incumbent's gap was frozen —
                # so take the pair when the joint gap improves 4x and
                # the feasibility regression stays recoverable.
                gap_joint = d_new - pobj_new
                if (
                    abs(gap_joint) <= 0.25 * abs(res.gap)
                    and pres_new <= 1e-3 * (1.0 + q_norm)
                    and rd_new <= max(res.dual_res,
                                      cfg.tol * (1 + c_norm))
                ):
                    _dbg(f"joint fold accepted: gap {res.gap:.3e} -> "
                         f"{gap_joint:.3e}, pres -> {pres_new:.2e}")
                    xh = x_cand
                    yh = y_cand
                    ok_p = ok_d = True
                    joint_taken = True
            return ok_p, ok_d, r.status

        ok_p, ok_d, st = _attempt(K_aug, c_t, l_t, u_t, cols=corr_cols)
        if not ok_p and not ok_d and st != Status.TIME_LIMIT \
                and res.primal_res > cfg.tol * (1.0 + q_norm) \
                and cfg.max_kkt - j_total > 0:
            # No accepted progress while the PRIMAL still needs work: the
            # pinned/clipped correction may be infeasible.  Retry the
            # round with penalty elastics (see _elastic_form), which
            # absorb any pin/clip conflict.  (When the primal already
            # certifies, ok_p=False is expected — a 1e-11-feasible
            # incumbent rarely improves — and the dual stall is handled
            # by the window/budget ladder in _attempt, so elastics would
            # only burn a round's budget.)
            _dbg("building elastic form")
            if K_elastic is None:
                # Elastics append 2m more one-entry columns; built on the
                # UNPERMUTED slack form (the band interleave does not
                # extend to them — this rare fallback runs sparse).
                K_elastic = _elastic_form(K_aug_plain)
            two_m = np.full(2 * m, cfg.refine_dual_cap)
            ok_p, ok_d, st = _attempt(
                K_elastic,
                np.concatenate([c_t, two_m]),
                np.concatenate([l_t, np.zeros(2 * m)]),
                np.concatenate([u_t, np.full(2 * m, zc)]),
                fmt="sparse" if corr_format == "band" else corr_format,
            )
        if st not in (Status.SOLVED, Status.KKT_LIMIT, Status.TIME_LIMIT):
            # Certificates/numerical failures on a zoomed re-centering do
            # not describe the original problem; stop refining and report
            # the best incumbent honestly.
            _, xh, yh, res = best
            return _result(res, Status.NUMERICAL_ERROR)
        if st == Status.TIME_LIMIT:
            break  # global wall clock is spent; the tail below reports
            # TIME_LIMIT with the best incumbent.

    # Rounds exhausted (or stalled) without certifying cfg.tol.
    np.clip(xh, l, u, out=xh)
    yh[:m_ineq] = np.maximum(yh[:m_ineq], 0.0)
    res = host_residuals(K64, c, q, l, u, m_ineq, xh, yh)
    j_total += 1
    _update_pools(xh, yh, res)
    if _terminated(res, q_norm, c_norm, cfg.tol, cfg.abs_gap_termination):
        return _result(res, Status.SOLVED)
    pair = _mixed_pair()
    if pair is not None:
        r_mix = host_residuals(K64, c, q, l, u, m_ineq, *pair)
        j_total += 1
        if _terminated(r_mix, q_norm, c_norm, cfg.tol,
                       cfg.abs_gap_termination):
            xh, yh, res = pair[0], pair[1], r_mix
            return _result(r_mix, Status.SOLVED)
    if best is not None and best[0] < _score(res):
        _, xh, yh, res = best
    timed_out = time.perf_counter() - start + time_used >= cfg.time_limit
    return _result(res, Status.TIME_LIMIT if timed_out else Status.KKT_LIMIT)
