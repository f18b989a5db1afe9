"""Residuals, duality gap, KKT error and termination — pure jittable math.

Behavioral parity targets (all re-derived, vectorised for (n,)/(m,) arrays):
- dual-cone projection:  PDLP/helpers.py:3-39
- residuals + gap:       PDLP/helpers.py:53-96
- KKT error:             PDLP/helpers.py:98-108
- termination:           PDLP/helpers.py:110-128
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def project_lambda_box(grad, is_neg_inf, is_pos_inf):
    """Project the reduced cost onto the normal cone of [l, u].

    Per variable (reference PDLP/helpers.py:3-39):
      (-inf, +inf) -> 0
      (-inf, real) -> min(grad, 0)
      (real, +inf) -> max(grad, 0)
      (real, real) -> grad
    """
    free = is_neg_inf & is_pos_inf
    neg_only = is_neg_inf & ~is_pos_inf
    pos_only = ~is_neg_inf & is_pos_inf
    out = jnp.where(neg_only, jnp.minimum(grad, 0.0), grad)
    out = jnp.where(pos_only, jnp.maximum(grad, 0.0), out)
    return jnp.where(free, 0.0, out)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Residuals:
    """Scalar convergence measures of one primal-dual point."""

    primal_res: jax.Array
    dual_res: jax.Array
    gap: jax.Array
    prim_obj: jax.Array
    adjusted_dual: jax.Array


def compute_residuals(
    x, y, kx, kty, c, q, l_dual, u_dual, ineq_mask, is_neg_inf, is_pos_inf
) -> Residuals:
    """Primal/dual residual norms, duality gap and objectives.

    `kx` = K x and `kty` = K'y are passed in (the solver carries them), so
    this costs only O(n + m) vector work — the reference recomputes both
    SpMVs on every call (PDLP/helpers.py:75,88).

    primal residual = || [A x - b ; min(G x - h, 0)] ||_2   (helpers.py:88-91)
    dual residual   = || (c - K'y) - lambda ||_2            (helpers.py:94)
    adjusted dual   = q'y + l_dual'max(lam,0) + u_dual'min(lam,0)  (:81-84)
    gap             = adjusted_dual - c'x                   (:85)
    """
    grad = c - kty
    lam = project_lambda_box(grad, is_neg_inf, is_pos_inf)

    # Exact-fp32 dots: at the TPU default these may round operands to
    # bf16 on the MXU, injecting ~1e-3 relative error into the gap — far
    # above a 1e-8 termination threshold (see ops/dense.py).
    _hi = jax.lax.Precision.HIGHEST
    prim_obj = jnp.dot(c, x, precision=_hi)
    dual_obj = jnp.dot(q, y, precision=_hi)
    adjusted_dual = (
        dual_obj
        + jnp.dot(l_dual, jnp.maximum(lam, 0.0), precision=_hi)
        + jnp.dot(u_dual, jnp.minimum(lam, 0.0), precision=_hi)
    )
    gap = adjusted_dual - prim_obj

    full_res = kx - q
    # Inequality rows G x >= h only penalise violation (helpers.py:89).
    res = jnp.where(ineq_mask, jnp.minimum(full_res, 0.0), full_res)
    primal_res = jnp.linalg.norm(res)
    dual_res = jnp.linalg.norm(grad - lam)
    return Residuals(primal_res, dual_res, gap, prim_obj, adjusted_dual)


def residuals_scaled(pb, x, y, kx, kty) -> Residuals:
    """Residuals of the (scaled) working problem — the restart metric."""
    return compute_residuals(
        x, y, kx, kty,
        pb.c, pb.q, pb.l_dual, pb.u_dual,
        pb.ineq_mask, pb.is_neg_inf, pb.is_pos_inf,
    )


def residuals_unscaled(pb, x, y, kx, kty) -> Residuals:
    """Residuals of the *original* problem from scaled iterates.

    Uses x_orig = d_col * x, y_orig = d_row * y and the identities
    K x_orig = kx / d_row, K' y_orig = kty / d_col, so no unscaled matrix is
    needed (reference keeps the full original K for this:
    PDLP/primal_dual_hybrid_gradient.py:157-161).
    """
    return compute_residuals(
        pb.d_col * x, pb.d_row * y, kx / pb.d_row, kty / pb.d_col,
        pb.c0, pb.q0, pb.l0_dual, pb.u0_dual,
        pb.ineq_mask, pb.is_neg_inf, pb.is_pos_inf,
    )


def kkt_error(res: Residuals, omega) -> jax.Array:
    """omega-weighted combined KKT error, the restart metric.

    sqrt(omega^2 ||r_p||^2 + ||r_d||^2 / omega^2 + gap^2)
    — exactly the reference's weighting (PDLP/helpers.py:106).
    """
    w2 = omega * omega
    return jnp.sqrt(
        w2 * res.primal_res**2 + res.dual_res**2 / w2 + res.gap**2
    )


def check_termination(res: Residuals, q_norm, c_norm, tol, *, abs_gap=False):
    """Relative KKT termination (PDLP/helpers.py:110-128).

    The reference uses the signed gap in cond3 (:127); `abs_gap=True`
    switches to |gap| (standard PDLP)."""
    gap = jnp.abs(res.gap) if abs_gap else res.gap
    cond1 = res.primal_res <= tol * (1.0 + q_norm)
    cond2 = res.dual_res <= tol * (1.0 + c_norm)
    cond3 = gap <= tol * (1.0 + jnp.abs(res.prim_obj) + jnp.abs(res.adjusted_dual))
    return cond1 & cond2 & cond3
