"""The fused restarted-PDHG loop: one `lax.while_loop`, zero host syncs.

Parity target: the nested inner/outer Python loops of
PDLP/primal_dual_hybrid_gradient.py:54-177, restructured as a single
device-resident while_loop whose body performs one PDHG iteration and, every
`restart_period` inner iterations, evaluates the three-candidate restart
criteria, the primal-weight update, and (on restart) termination on the
*unscaled* problem — all via `lax.cond`, with integer status codes instead
of Python strings and early `break`s.

Work accounting keeps the reference's KKT-pass ledger exactly
(j += 1/step [:86], += trials for adaptive [step.py:93], += 1/infeasibility
check [:93], += 3/restart check [:128], += 1 KKT_first refresh [:154],
+= 1 outer residual pass [:165]) even though the actual SpMV count here is
lower (the carried K x / K'y products make certificates and restart metrics
vector work).

Wall-clock limits (reference polls time.time() every iteration, :68-74)
are handled by the host chunking in solve.py: the device runs a bounded
number of KKT passes per dispatch, the host checks the clock in between.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpdlp.config import SolverConfig, Status
from tpdlp.solver import residuals as R
from tpdlp.solver import step as S
from tpdlp.solver.infeasibility import detect_infeasibility
from tpdlp.solver.state import PDHGState


def primal_weight_update(x_restart, x, y_restart, y, omega, theta_smooth):
    """Log-smoothed primal-weight update (PDLP/enhancements.py:73-78):
    omega <- exp(theta log(||dy||/||dx||) + (1-theta) log(omega)),
    guarded on nonzero iterate movement."""
    dx = jnp.linalg.norm(x_restart - x)
    dy = jnp.linalg.norm(y_restart - y)
    new = jnp.exp(
        theta_smooth * jnp.log(dy / dx) + (1.0 - theta_smooth) * jnp.log(omega)
    )
    return jnp.where((dx > 0) & (dy > 0), new, omega)


def _clamped_pwu(x_restart, x, y_restart, y, omega, omega_init, cfg):
    """primal_weight_update clamped to cfg.omega_clamp decades around the
    initial omega (see config.omega_clamp for the measured spiral this
    guards against); clamp disabled when omega_clamp == 0."""
    new = primal_weight_update(
        x_restart, x, y_restart, y, omega, cfg.theta_smooth
    )
    if not cfg.omega_clamp:
        return new
    return jnp.clip(
        new, omega_init / cfg.omega_clamp, omega_init * cfg.omega_clamp
    )


def _fresh_products(pb, cfg: SolverConfig, x, y, kx, kty):
    """Exact (K x, K'y) for a candidate about to be RESIDUAL-EVALUATED.

    When the step products run the operator's throughput path
    (cfg.step_products fast + op.has_fast_products, i.e. the MXU dot on
    TPU with its ~1e-5 relative noise), the carried products are not
    accurate enough to certify termination — recompute them through the
    exact path here.  Otherwise the carried products ARE exact: pass
    them through (no extra SpMV)."""
    from tpdlp.config import fast_step_products

    if fast_step_products(cfg) and pb.op.has_fast_products:
        return pb.op.mv(x), pb.op.rmv(y)
    return kx, kty


def _restart_check(pb, cfg: SolverConfig, st: PDHGState) -> PDHGState:
    """Every-restart_period evaluation (primal_dual_hybrid_gradient.py:115-142)
    plus, on restart, the reference's outer-loop tail (:148-177)."""
    dtype = st.x.dtype

    x_avg = st.x_sum / st.eta_sum
    y_avg = st.y_sum / st.eta_sum
    kx_avg = pb.op.mv(x_avg)
    kty_avg = pb.op.rmv(y_avg)

    # Exact products of the current iterate (fast-step mode refreshes the
    # carried pair; also resets any accumulated step-product drift into
    # the carry on restart below).
    kx_cur, kty_cur = _fresh_products(pb, cfg, st.x, st.y, st.kx, st.kty)
    st = st.replace(kx=kx_cur, kty=kty_cur)

    res_cur = R.residuals_scaled(pb, st.x, st.y, st.kx, st.kty)
    res_avg = R.residuals_scaled(pb, x_avg, y_avg, kx_avg, kty_avg)
    res_prev = R.residuals_scaled(pb, st.x_prev, st.y_prev, st.kx_prev, st.kty_prev)
    kkt_cur = R.kkt_error(res_cur, st.omega)
    kkt_avg = R.kkt_error(res_avg, st.omega)
    kkt_prev = R.kkt_error(res_prev, st.omega)

    st = st.replace(j=st.j + 3)  # three KKT passes per check (:128)

    kkt_min = jnp.minimum(kkt_cur, kkt_avg)
    use_avg = kkt_cur >= kkt_avg  # candidate choice (:133)

    # fp32 divergence produces NaN/Inf iterates whose KKT error satisfies no
    # restart criterion — without this check the loop would silently burn
    # the whole KKT budget.  (The reference has the same blind spot.)
    diverged = ~(jnp.isfinite(kkt_cur) & jnp.isfinite(kkt_avg))
    st = st.replace(
        status=jnp.where(
            diverged & (st.status == jnp.int32(Status.RUNNING)),
            jnp.int32(Status.NUMERICAL_ERROR),
            st.status,
        )
    )

    sufficient = kkt_min <= cfg.beta_sufficient * st.kkt_first
    necessary = (kkt_min <= cfg.beta_necessary * st.kkt_first) & (
        kkt_min > kkt_prev
    )
    artificial = st.t.astype(dtype) >= cfg.beta_artificial * st.k.astype(dtype)
    do_restart = (sufficient | necessary | artificial) & ~diverged

    def restart(st: PDHGState) -> PDHGState:
        sel = lambda a, b: jnp.where(use_avg, a, b)
        x_r = sel(x_avg, st.x)
        y_r = sel(y_avg, st.y)
        kx_r = sel(kx_avg, st.kx)
        kty_r = sel(kty_avg, st.kty)
        res_r = jax.tree.map(sel, res_avg, res_cur)

        omega_new = (
            _clamped_pwu(
                st.x_restart, x_r, st.y_restart, y_r, st.omega,
                st.omega_init, cfg,
            )
            if cfg.primal_weight_update
            else st.omega
        )
        # KKT_first refresh under the (possibly updated) omega (:153-154).
        # The residuals of the selected candidate are already in res_r — only
        # the omega weighting changes, so no new SpMV is issued (the
        # reference spends a full pass here; we keep its +1 ledger entry).
        kkt_first_new = R.kkt_error(res_r, omega_new)

        # Termination on the unscaled problem (:157-165), +1 pass.
        res_term = R.residuals_unscaled(pb, x_r, y_r, kx_r, kty_r)
        solved = R.check_termination(
            res_term,
            pb.q_norm_term,
            pb.c_norm_term,
            cfg.tol,
            abs_gap=cfg.abs_gap_termination,
        )
        status_new = jnp.where(
            solved, jnp.int32(Status.SOLVED), st.status
        )
        zeros_like = jnp.zeros_like
        return st.replace(
            x=x_r,
            y=y_r,
            kx=kx_r,
            kty=kty_r,
            x_sum=zeros_like(st.x_sum),
            y_sum=zeros_like(st.y_sum),
            eta_sum=jnp.zeros_like(st.eta_sum),
            x_restart=x_r,
            y_restart=y_r,
            kx_restart=kx_r,
            kty_restart=kty_r,
            t=jnp.zeros_like(st.t),
            n_restarts=st.n_restarts + 1,
            omega=omega_new,
            kkt_first=kkt_first_new,
            j=st.j + 2,
            status=status_new,
            prim_obj=res_term.prim_obj,
            adjusted_dual=res_term.adjusted_dual,
            primal_res=res_term.primal_res,
            dual_res=res_term.dual_res,
            gap=res_term.gap,
        )

    return jax.lax.cond(do_restart, restart, lambda s: s, st)


def _restart_check_halpern(pb, cfg: SolverConfig, st: PDHGState) -> PDHGState:
    """Restart evaluation for the Halpern scheme.

    The carried z iterate may be infeasible (the anchored combination is
    not projected), so the candidates are the last feasible PDHG output
    (held in the *_prev slots) and the running average of feasible outputs.
    The 'necessary' criterion (needs a previous candidate's KKT) is
    dropped; sufficient + artificial restarts remain.  On restart the
    anchor, the z iterate and the feasible-output slots all reset to the
    chosen candidate.
    """
    dtype = st.x.dtype
    x_f, y_f = st.x_prev, st.y_prev
    # The feasible pair is what gets residual-evaluated (and possibly
    # certified) — refresh its products in fast-step mode.
    kx_f, kty_f = _fresh_products(
        pb, cfg, x_f, y_f, st.kx_prev, st.kty_prev
    )
    x_avg = st.x_sum / st.eta_sum
    y_avg = st.y_sum / st.eta_sum
    kx_avg = pb.op.mv(x_avg)
    kty_avg = pb.op.rmv(y_avg)

    res_f = R.residuals_scaled(pb, x_f, y_f, kx_f, kty_f)
    res_avg = R.residuals_scaled(pb, x_avg, y_avg, kx_avg, kty_avg)
    kkt_f = R.kkt_error(res_f, st.omega)
    kkt_avg = R.kkt_error(res_avg, st.omega)
    st = st.replace(j=st.j + 2)

    use_avg = kkt_f >= kkt_avg
    # Divergence check — see _restart_check.
    diverged = ~(jnp.isfinite(kkt_f) & jnp.isfinite(kkt_avg))
    st = st.replace(
        status=jnp.where(
            diverged & (st.status == jnp.int32(Status.RUNNING)),
            jnp.int32(Status.NUMERICAL_ERROR),
            st.status,
        )
    )
    # cuPDLP+-style sufficient criterion: the omega-weighted FIXED-POINT
    # residual ||z - T(z)|| has decayed vs its value at the cycle start
    # (kkt_first holds that value in this scheme, measured at t == 1).
    sufficient = (st.kkt_first > 0) & (
        st.fp_res <= cfg.beta_sufficient * st.kkt_first
    )
    artificial = st.t.astype(dtype) >= cfg.beta_artificial * st.k.astype(dtype)
    do_restart = (sufficient | artificial) & ~diverged

    def restart(st: PDHGState) -> PDHGState:
        sel = lambda a, b: jnp.where(use_avg, a, b)
        x_r = sel(x_avg, x_f)
        y_r = sel(y_avg, y_f)
        kx_r = sel(kx_avg, kx_f)
        kty_r = sel(kty_avg, kty_f)
        res_r = jax.tree.map(sel, res_avg, res_f)

        omega_new = (
            _clamped_pwu(
                st.x_restart, x_r, st.y_restart, y_r, st.omega,
                st.omega_init, cfg,
            )
            if cfg.primal_weight_update
            else st.omega
        )
        res_term = R.residuals_unscaled(pb, x_r, y_r, kx_r, kty_r)
        solved = R.check_termination(
            res_term,
            pb.q_norm_term,
            pb.c_norm_term,
            cfg.tol,
            abs_gap=cfg.abs_gap_termination,
        )
        status_new = jnp.where(solved, jnp.int32(Status.SOLVED), st.status)
        zeros_like = jnp.zeros_like
        return st.replace(
            x=x_r,
            y=y_r,
            kx=kx_r,
            kty=kty_r,
            x_prev=x_r,
            y_prev=y_r,
            kx_prev=kx_r,
            kty_prev=kty_r,
            x_sum=zeros_like(st.x_sum),
            y_sum=zeros_like(st.y_sum),
            eta_sum=jnp.zeros_like(st.eta_sum),
            x_restart=x_r,
            y_restart=y_r,
            kx_restart=kx_r,
            kty_restart=kty_r,
            t=jnp.zeros_like(st.t),
            n_restarts=st.n_restarts + 1,
            omega=omega_new,
            # Re-measured at the first iteration of the new cycle.
            kkt_first=jnp.zeros_like(st.kkt_first),
            fp_res=jnp.zeros_like(st.fp_res),
            j=st.j + 2,
            status=status_new,
            prim_obj=res_term.prim_obj,
            adjusted_dual=res_term.adjusted_dual,
            primal_res=res_term.primal_res,
            dual_res=res_term.dual_res,
            gap=res_term.gap,
        )

    return jax.lax.cond(do_restart, restart, lambda s: s, st)


def _restart_for(cfg: SolverConfig):
    return (
        _restart_check_halpern
        if cfg.step_scheme == "halpern"
        else _restart_check
    )


def restart_check_gated(
    pb, cfg: SolverConfig, st: PDHGState, j_budget=None
) -> PDHGState:
    """Restart check under the lockstep (global-period) schedule: fire when
    at least `restart_period` iterations have run since the last restart.
    Used by the batched solver, which evaluates this at global step
    boundaries so the (expensive) check amortises across the batch instead
    of being select-executed every iteration under vmap.

    `j_budget` (the per-chunk KKT cap) keeps elements HELD at the budget
    from being re-checked at every global boundary while they wait for
    stragglers — without it a held element's KKT ledger inflates by 2-3
    phantom passes per period and can burn max_kkt without iterating."""
    check = _restart_for(cfg)
    fire = (st.t >= cfg.restart_period) & (
        st.status == jnp.int32(Status.RUNNING)
    )
    if j_budget is not None:
        fire &= st.j < j_budget
    return jax.lax.cond(
        fire, lambda s: check(pb, cfg, s), lambda s: s, st
    )


def make_live(pb, cfg: SolverConfig, include_restart: bool = True):
    """One UNGATED PDHG iteration (no status check): the builder shared by
    the per-iteration body (`make_body` wraps it in the status cond) and
    the blocked runner (`run_chunk_blocked_impl` straight-lines
    restart_period of them per while step — legal only when nothing
    inside can change the status, see `blocked_allowed`).

    `include_restart=False` omits the per-iteration restart condition; the
    caller schedules `restart_check_gated` itself (the batched lockstep
    mode, where a vmapped `lax.cond` would otherwise select-execute the
    restart work every iteration for every element).
    """

    def take_step(st: PDHGState, k_new):
        """Dispatch the configured step; returns the feasible PDHG output."""
        if cfg.adaptive:
            result = S.adaptive_step(
                pb, cfg, st.x, st.y, st.kx, st.kty, st.eta, st.omega, k_new
            )
        else:
            result = S.fixed_step(
                pb, cfg, st.x, st.y, st.kx, st.kty, st.eta, st.omega
            )
        return result, S.step_mv(pb, cfg)[1](result.y)

    def apply_certificates(
        st2, k_new, x_new, y_new, kx_new, kty_new,
        x_old, y_old, kx_old, kty_old,
    ):
        """Both certificate families on a feasible iterate pair: ray-based
        on the (new, old) diffs, plus the normalized-iterate/average
        families.  Shared by the vanilla and Halpern bodies (which differ
        only in WHICH pair is feasible)."""
        if cfg.infeasibility_detect:

            def check(s: PDHGState) -> PDHGState:
                lam = R.project_lambda_box(
                    pb.c - kty_new, pb.is_neg_inf, pb.is_pos_inf
                )
                cert = detect_infeasibility(
                    pb,
                    x_new, y_new, x_old, y_old,
                    lam, s.lam_prev,
                    kx_new - kx_old,
                    kty_new - kty_old,
                    cfg.infeas_tol,
                )
                # Restart-window ray: the same certificates on the diff
                # from the last restart point.  Adaptive stepsizes make
                # CONSECUTIVE diffs noisy (the retry/accept jitter keeps
                # the non-ray coordinates' share of the normalised ray
                # above infeas_tol — measured: a planted-unbounded LP
                # undetected in 28k adaptive iterations that fixed steps
                # certify at k~1100), while the window diff averages the
                # jitter out.  Products and the restart lambda come from
                # carried kx/kty_restart — no extra SpMV.
                lam_restart = R.project_lambda_box(
                    pb.c - s.kty_restart, pb.is_neg_inf, pb.is_pos_inf
                )
                cert_win = detect_infeasibility(
                    pb,
                    x_new, y_new, s.x_restart, s.y_restart,
                    lam, lam_restart,
                    kx_new - s.kx_restart,
                    kty_new - s.kty_restart,
                    cfg.infeas_tol,
                )
                cert = jnp.where(
                    cert != jnp.int32(Status.RUNNING), cert, cert_win
                )
                status_new = jnp.where(
                    cert != jnp.int32(Status.RUNNING), cert, s.status
                )
                return s.replace(lam_prev=lam, j=s.j + 1, status=status_new)

            # Needs two iterates (reference k > 1 guard, :89).
            st2 = jax.lax.cond(k_new > 1, check, lambda s: s, st2)

        if cfg.normalized_certificates:
            from tpdlp.solver.infeasibility import (
                normalized_average_certificates,
                normalized_iterate_certificates,
                validate_normalized_candidate,
            )

            cert, x_norm, y_norm = normalized_iterate_certificates(
                x_new, y_new, st2.x_norm_prev, st2.y_norm_prev, k_new,
                cfg.normalized_tol_conv, cfg.normalized_tol_nonzero,
            )
            # Farkas-validate the trigger (the raw convergence test
            # false-fires on any converging solve at small k — see
            # validate_normalized_candidate).  Rays are normalised
            # inside, so the unscaled iterate and its carried products
            # stand in for x/k, Kx/k.
            cert = validate_normalized_candidate(
                pb, cert, x_new, kx_new, y_new, kty_new, cfg.infeas_tol,
            )
            xs = st2.x_plain_sum + x_new
            ys = st2.y_plain_sum + y_new
            kxs = st2.kx_plain_sum + kx_new
            ktys = st2.kty_plain_sum + kty_new
            cert_avg = normalized_average_certificates(
                xs, ys, x_new, y_new, k_new,
                cfg.normalized_tol_conv, cfg.normalized_tol_nonzero,
            )
            cert_avg = validate_normalized_candidate(
                pb, cert_avg, xs, kxs, ys, ktys, cfg.infeas_tol,
            )
            fireable = k_new > 2  # both families need two history points
            status_new = jnp.where(
                (cert != jnp.int32(Status.RUNNING)) & fireable,
                cert,
                jnp.where(
                    (cert_avg != jnp.int32(Status.RUNNING)) & fireable,
                    cert_avg,
                    st2.status,
                ),
            )
            st2 = st2.replace(
                x_norm_prev=x_norm,
                y_norm_prev=y_norm,
                x_plain_sum=xs,
                y_plain_sum=ys,
                kx_plain_sum=kxs,
                kty_plain_sum=ktys,
                status=status_new,
            )
        return st2

    def live_body(st: PDHGState) -> PDHGState:
        k_new = st.k + 1
        result, kty_new = take_step(st, k_new)
        x_new, y_new, kx_new, eta_used, eta_next, j_inc = result

        st2 = st.replace(
            x=x_new,
            y=y_new,
            kx=kx_new,
            kty=kty_new,
            x_prev=st.x,
            y_prev=st.y,
            kx_prev=st.kx,
            kty_prev=st.kty,
            k=k_new,
            j=st.j + j_inc,
        )
        st2 = apply_certificates(
            st2, k_new, x_new, y_new, kx_new, kty_new,
            st.x, st.y, st.kx, st.kty,
        )

        # Averaging accumulation (:107-112), then the periodic restart check.
        st3 = st2.replace(
            t=st2.t + 1,
            x_sum=st2.x_sum + eta_used * x_new,
            y_sum=st2.y_sum + eta_used * y_new,
            eta_sum=st2.eta_sum + eta_used,
            eta=eta_next,
        )

        if not include_restart:
            return st3
        fire = (
            (st3.t % cfg.restart_period == 0)
            & (st3.status == jnp.int32(Status.RUNNING))
        )
        return jax.lax.cond(
            fire, lambda s: _restart_check(pb, cfg, s), lambda s: s, st3
        )

    def live_body_halpern(st: PDHGState) -> PDHGState:
        """One reflected-Halpern iteration.  The carry (x, y, kx, kty) is
        the anchored point z_t (possibly outside the box/cone); the PDHG
        step T(z_t) is feasible and is what certificates, averaging, and
        restart candidates use (held in the *_prev slots)."""
        k_new = st.k + 1
        result, kty_f = take_step(st, k_new)
        x_f, y_f, kx_f, eta_used, eta_next, j_inc = result

        st2 = st.replace(k=k_new, j=st.j + j_inc)
        st2 = apply_certificates(
            st2, k_new, x_f, y_f, kx_f, kty_f,
            st.x_prev, st.y_prev, st.kx_prev, st.kty_prev,
        )

        # Halpern anchored combination of the REFLECTED step (linear in the
        # carried operator products, so no extra SpMV).
        t_new = st.t + 1
        tf = t_new.astype(st.x.dtype)
        w = tf / (tf + 1.0)
        wa = 1.0 / (tf + 1.0)
        z_x = w * (2.0 * x_f - st.x) + wa * st.x_restart
        z_y = w * (2.0 * y_f - st.y) + wa * st.y_restart
        z_kx = w * (2.0 * kx_f - st.kx) + wa * st.kx_restart
        z_kty = w * (2.0 * kty_f - st.kty) + wa * st.kty_restart

        # Omega-weighted fixed-point residual ||z - T(z)|| — the restart
        # progress metric for this scheme; its value at t == 1 becomes the
        # cycle's baseline (kkt_first).
        dx = x_f - st.x
        dy = y_f - st.y
        _hi = jax.lax.Precision.HIGHEST  # exact fp32 (see ops/dense.py)
        fp = jnp.sqrt(
            st.omega * jnp.vdot(dx, dx, precision=_hi)
            + jnp.vdot(dy, dy, precision=_hi) / st.omega
        )
        kkt_first_new = jnp.where(t_new == 1, fp, st2.kkt_first)

        st3 = st2.replace(
            fp_res=fp,
            kkt_first=kkt_first_new,
            x=z_x,
            y=z_y,
            kx=z_kx,
            kty=z_kty,
            x_prev=x_f,
            y_prev=y_f,
            kx_prev=kx_f,
            kty_prev=kty_f,
            t=t_new,
            x_sum=st2.x_sum + eta_used * x_f,
            y_sum=st2.y_sum + eta_used * y_f,
            eta_sum=st2.eta_sum + eta_used,
            eta=eta_next,
        )

        if not include_restart:
            return st3
        # NB firing the sufficient criterion eagerly (every iteration, the
        # fp residual is carried anyway) was tried and REGRESSED two suite
        # instances by 1.4-2x — too-frequent restarts reset the anchor
        # momentum; the periodic boundary is kept.
        fire = (
            (st3.t % cfg.restart_period == 0)
            & (st3.status == jnp.int32(Status.RUNNING))
        )
        return jax.lax.cond(
            fire,
            lambda s: _restart_check_halpern(pb, cfg, s),
            lambda s: s,
            st3,
        )

    if cfg.step_scheme == "halpern":
        if cfg.adaptive:
            raise ValueError(
                "step_scheme='halpern' requires adaptive=False: the "
                "Malitsky-Pock stepsize rule is incompatible with the "
                "anchored reflected iteration (it stalls); the scheme is "
                "designed for the fixed eta = 0.9/||K|| step"
            )
        return live_body_halpern
    if cfg.step_scheme == "vanilla":
        return live_body
    raise ValueError(f"unknown step_scheme: {cfg.step_scheme!r}")


def make_body(pb, cfg: SolverConfig, include_restart: bool = True):
    """One PDHG iteration as a pure state transition.

    The body is a no-op once the status is terminal: required for batched
    (vmap) solves, where the lifted while_loop keeps stepping every batch
    element until all are done — finished instances must hold their state.
    """
    live = make_live(pb, cfg, include_restart)

    def body(st: PDHGState) -> PDHGState:
        return jax.lax.cond(
            st.status == jnp.int32(Status.RUNNING), live, lambda s: s, st
        )

    return body


def _chunk_cond(j_budget):
    def cond(s: PDHGState):
        return (s.status == jnp.int32(Status.RUNNING)) & (s.j < j_budget)

    return cond


def run_chunk_impl(st: PDHGState, pb, j_budget, cfg: SolverConfig) -> PDHGState:
    """Unjitted chunk runner (composable under vmap for batched solves)."""
    return jax.lax.while_loop(_chunk_cond(j_budget), make_body(pb, cfg), st)


def blocked_allowed(cfg: SolverConfig) -> bool:
    """True when the blocked (cond-free straight-line cycle) loop is
    semantically identical to the per-iteration loop: the status must not
    be able to change INSIDE a restart cycle, i.e. no per-iteration
    certificate families are configured.  (Restart checks — the only
    other status writers — run at cycle boundaries in both modes.)"""
    return (
        cfg.loop_mode != "periter"
        and not cfg.infeasibility_detect
        and not cfg.normalized_certificates
        # The cycle is UNROLLED restart_period times into one program;
        # beyond this the compile time/program size stops paying for the
        # removed loop overhead (default period is 40).
        and cfg.restart_period <= 256
    )


def run_chunk_blocked_impl(
    st: PDHGState, pb, j_budget, cfg: SolverConfig, aligned: bool = False,
    unroll: bool | None = None,
) -> PDHGState:
    """Blocked chunk runner: one while step = `restart_period` ungated
    iterations straight-lined + the boundary restart check.

    Removing the per-iteration `lax.cond`s does more than save the ~14 us
    loop-step overhead: without cond region boundaries between the step
    products, XLA keeps a VMEM-resident dense K across the whole cycle
    (v5e: 128 MB VMEM), lifting the iteration rate from HBM-streaming to
    VMEM speed — measured 5.1k -> 14.5k it/s on mittelmann-s (2000x5000,
    tol=1e-4 protocol, fast step products).

    Correctness: requires `blocked_allowed(cfg)` (nothing inside a cycle
    can change the status).  A divergence (NaN iterates) surfaces at the
    boundary check exactly as in the per-iteration loop.  The KKT budget
    is checked per block, so a chunk may overrun j_budget by up to one
    cycle (~restart_period + 5 passes) — callers treat j_budget as a
    dispatch granularity bound, not an exact stop (solve.py re-checks).
    Entry states mid-cycle (resume from a per-iteration checkpoint) are
    first aligned to a cycle boundary by the per-iteration body.
    """
    cond = _chunk_cond(j_budget)
    T = cfg.restart_period

    # Align t to a cycle boundary (resume from a per-iteration
    # checkpoint).  `aligned=True` (static) omits this loop entirely:
    # fresh states have t == 0, and blocked chunks always EXIT at a
    # boundary, so solve.py can assert alignment for every chunk after
    # the first — the extra while_loop otherwise costs ~8% (it gives XLA
    # a second, cond-fenced use of K to plan VMEM around).
    if not aligned:
        body1 = make_body(pb, cfg)
        st = jax.lax.while_loop(
            lambda s: cond(s) & (s.t % T != 0), body1, st
        )

    live = make_live(pb, cfg, include_restart=False)
    check = _restart_for(cfg)
    if unroll is None:
        # The Python unroll is what buys the TPU VMEM residency (a
        # fori_loop body is its own region, like a cond).  Off-TPU there
        # is no residency to win and the 40x-unrolled program just
        # compiles ~10x slower, so loop instead — same math, same
        # trajectory.
        unroll = jax.default_backend() == "tpu"

    def cycle(s: PDHGState) -> PDHGState:
        # NO status gate here (the while cond already guarantees RUNNING
        # on entry — this runner is single-instance only, NOT vmap-safe):
        # wrapping the cycle in a lax.cond would fence the products into
        # a branch computation and forfeit the VMEM residency.
        if unroll:
            for _ in range(T):
                s = live(s)
        else:
            s = jax.lax.fori_loop(0, T, lambda _, x: live(x), s)
        # t is a multiple of T here by construction: the boundary check
        # always fires (matching the per-iteration fire condition).
        return check(pb, cfg, s)

    return jax.lax.while_loop(cond, cycle, st)


def run_chunk_auto_impl(
    st: PDHGState, pb, j_budget, cfg: SolverConfig, aligned: bool = False
) -> PDHGState:
    """Single-instance chunk runner: blocked when legal, per-iteration
    otherwise.  (Batched/vmapped solves keep run_chunk_impl: their
    elements finish at different times, and the blocked body would keep
    stepping an element whose budget is spent while stragglers catch up.)
    """
    if blocked_allowed(cfg):
        return run_chunk_blocked_impl(st, pb, j_budget, cfg, aligned)
    return run_chunk_impl(st, pb, j_budget, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "aligned"))
def run_chunk(
    st: PDHGState, pb, j_budget, cfg: SolverConfig, aligned: bool = False
) -> PDHGState:
    """Run iterations until a terminal status or j >= j_budget.

    `aligned` (static): caller asserts st.t is a multiple of
    cfg.restart_period (fresh states, or any state left by a blocked
    chunk) — skips the alignment pre-loop in blocked mode."""
    return run_chunk_auto_impl(st, pb, j_budget, cfg, aligned)


@functools.partial(jax.jit, static_argnames=("cfg",))
def final_eval(st: PDHGState, pb, cfg: SolverConfig) -> PDHGState:
    """The reference's outer-loop tail on the KKT-budget-exhausted path
    (primal_dual_hybrid_gradient.py:148-177 after an inner exit with
    j >= max_kkt): one last unscaled residual evaluation decides Solved vs
    'KKT passes limit exceeded'; n and j advance as in the reference.
    In the Halpern scheme the carried z may be infeasible, so the last
    feasible PDHG output (the *_prev slots) is evaluated instead."""
    if cfg.step_scheme == "halpern":
        kx_f, kty_f = _fresh_products(
            pb, cfg, st.x_prev, st.y_prev, st.kx_prev, st.kty_prev
        )
        res_term = R.residuals_unscaled(pb, st.x_prev, st.y_prev, kx_f, kty_f)
    else:
        kx_c, kty_c = _fresh_products(pb, cfg, st.x, st.y, st.kx, st.kty)
        res_term = R.residuals_unscaled(pb, st.x, st.y, kx_c, kty_c)
    solved = R.check_termination(
        res_term,
        pb.q_norm_term,
        pb.c_norm_term,
        cfg.tol,
        abs_gap=cfg.abs_gap_termination,
    )
    status_new = jnp.where(
        solved, jnp.int32(Status.SOLVED), jnp.int32(Status.KKT_LIMIT)
    )
    return st.replace(
        n_restarts=st.n_restarts + 1,
        j=st.j + 2,
        status=status_new,
        prim_obj=res_term.prim_obj,
        adjusted_dual=res_term.adjusted_dual,
        primal_res=res_term.primal_res,
        dual_res=res_term.dual_res,
        gap=res_term.gap,
    )
