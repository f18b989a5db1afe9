"""PDHG step kernels: fixed stepsize and Malitsky-Pock adaptive stepsize.

Parity targets (re-derived as pure functions on (n,)/(m,) arrays):
- fixed step:    PDLP/primal_dual_hybrid_gradient_step.py:3-40
- adaptive step: PDLP/primal_dual_hybrid_gradient_step.py:43-115

One step:
    grad  = c - K'y
    x+    = clip(x - (eta/omega) grad, l, u)
    x_bar = x+ + theta (x+ - x)
    y+    = proj_{>=0 on ineq rows}( y + eta*omega (q - K x_bar) )

Cost: one K'y (carried in from the previous iteration) and one K x+ per
step.  K x_bar is formed from the carried products by linearity
(K x_bar = (1+theta) K x+ - theta K x), and the adaptive denominator
dy' K dx uses K dx = K x+ - K x — so the adaptive rule costs *no* extra
SpMV, versus the reference's explicit `diff_y.T @ K @ diff_x` (step.py:96).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpdlp.config import SolverConfig, fast_step_products


def step_mv(pb, cfg: SolverConfig):
    """The K-product pair the STEP uses: the operator's throughput path
    (op.mv_fast, e.g. the MXU dot on TPU) when cfg.step_products resolves
    fast, the exact path otherwise.  Termination soundness does not rest
    on this choice — restart checks refresh carried products through the
    exact path before certifying (loop.py::_fresh_products)."""
    if fast_step_products(cfg):
        return (lambda x: pb.op.mv_fast(x)), (lambda y: pb.op.rmv_fast(y))
    return (lambda x: pb.op.mv(x)), (lambda y: pb.op.rmv(y))


class StepResult(NamedTuple):
    x: jax.Array
    y: jax.Array
    kx: jax.Array
    eta_used: jax.Array  # stepsize weight for iterate averaging
    eta_next: jax.Array  # stepsize for the next iteration
    j_inc: jax.Array  # KKT passes consumed (int32)


def _primal_dual_update(pb, cfg, x, y, kx, grad, eta, omega, theta):
    """The shared primal/dual update given grad = c - K'y."""
    tau = eta / omega
    sigma = eta * omega
    x_new = jnp.clip(x - tau * grad, pb.l, pb.u)
    kx_new = step_mv(pb, cfg)[0](x_new)
    k_xbar = (1.0 + theta) * kx_new - theta * kx
    y_new = y + sigma * (pb.q - k_xbar)
    y_new = jnp.where(pb.ineq_mask, jnp.maximum(y_new, 0.0), y_new)
    return x_new, y_new, kx_new


def fixed_step(pb, cfg: SolverConfig, x, y, kx, kty, eta, omega) -> StepResult:
    """One fixed-stepsize PDHG step (reference step.py:3-40); j += 1."""
    grad = pb.c - kty
    x_new, y_new, kx_new = _primal_dual_update(
        pb, cfg, x, y, kx, grad, eta, omega, cfg.theta
    )
    one = jnp.ones((), jnp.int32)
    return StepResult(x_new, y_new, kx_new, eta, eta, one)


def adaptive_step(
    pb, cfg: SolverConfig, x, y, kx, kty, eta, omega, k_new
) -> StepResult:
    """Malitsky-Pock-style adaptive step.

    eta_bar  = (omega ||dx||^2 + ||dy||^2/omega) / (2 |dy' K dx|)
    eta'     = min((1 - (k+1)^p_shrink) eta_bar, (1 + (k+1)^p_grow) eta)

    Two rules (cfg.adaptive_rule):
    - "reference": the step is always taken with the incoming eta; if
      eta > eta_bar the *averaging weight* becomes eta' (the reference's
      200-trial loop returns unconditionally after one trial,
      step.py:110-115, so rejected steps are kept).  j += 1.
    - "linesearch": true backtracking — retry the step with eta' until
      eta <= eta_bar (bounded by cfg.max_backtracks).  j += trials.
    """
    grad = pb.c - kty

    # Exponents use the post-increment iteration counter + 1
    # (caller increments k before stepping; reference step.py:102,107).
    kp1 = (k_new + 1).astype(eta.dtype)
    shrink = 1.0 - kp1**cfg.adaptive_shrink_exponent
    grow = 1.0 + kp1**cfg.adaptive_grow_exponent

    def trial(eta_t):
        x_new, y_new, kx_new = _primal_dual_update(
            pb, cfg, x, y, kx, grad, eta_t, omega, cfg.theta
        )
        dx = x_new - x
        dy = y_new - y
        k_dx = kx_new - kx  # K dx by linearity — no extra SpMV
        _hi = jax.lax.Precision.HIGHEST  # exact fp32 (see ops/dense.py)
        denom = 2.0 * jnp.dot(dy, k_dx, precision=_hi)
        num = (
            omega * jnp.vdot(dx, dx, precision=_hi)
            + jnp.vdot(dy, dy, precision=_hi) / omega
        )
        eta_bar = jnp.where(
            denom != 0.0, num / jnp.abs(denom), jnp.asarray(jnp.inf, eta.dtype)
        )
        eta_prime = jnp.minimum(
            jnp.where(jnp.isinf(eta_bar), jnp.inf, shrink * eta_bar),
            grow * eta_t,
        )
        accepted = eta_t <= eta_bar
        return x_new, y_new, kx_new, eta_prime, accepted

    if cfg.adaptive_rule == "reference":
        x_new, y_new, kx_new, eta_prime, accepted = trial(eta)
        # Accepted: averaging weight = eta, next eta = eta'.
        # Rejected: the reference still keeps the step but reports eta' as
        # both the used and next stepsize (step.py:113-115).
        eta_used = jnp.where(accepted, eta, eta_prime)
        return StepResult(
            x_new, y_new, kx_new, eta_used, eta_prime, jnp.ones((), jnp.int32)
        )

    if cfg.adaptive_rule != "linesearch":
        raise ValueError(f"unknown adaptive_rule: {cfg.adaptive_rule!r}")

    def cond(carry):
        _, _, _, _, _, accepted, trials = carry
        return (~accepted) & (trials < cfg.max_backtracks)

    x0, y0, kx0, ep0, acc0 = trial(eta)
    init = (x0, y0, kx0, eta, ep0, acc0, jnp.ones((), jnp.int32))

    def ls_body(carry):
        # Retry with the proposed (smaller) eta'.
        _, _, _, _, eta_prime, _, trials = carry
        x_new, y_new, kx_new, ep_new, accepted = trial(eta_prime)
        return (x_new, y_new, kx_new, eta_prime, ep_new, accepted, trials + 1)

    x_f, y_f, kx_f, eta_f, ep_f, _, trials = jax.lax.while_loop(
        cond, ls_body, init
    )
    return StepResult(x_f, y_f, kx_f, eta_f, ep_f, trials)
