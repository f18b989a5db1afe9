"""Ray-based primal/dual infeasibility certificates — fully vectorised.

Reference analog: PDLP/enhancements.py:80-161 (`detect_infeasibility`), whose
per-variable Python loop over the bound cone (enhancements.py:126-138) is
replaced by mask algebra, and whose two extra SpMVs (K @ dx at :116-119 and
K' @ dy at :145) come for free from the carried operator products:
K dx = kx - kx_prev, K'dy = kty - kty_prev.

Certificates from iterate differences (dx, dy, dlam), *normalised to unit
rays* with strict objective-movement conditions — two deliberate fixes over
the reference (each verified against planted infeasible/unbounded fixtures):

1. The reference's unnormalised test passes trivially once the iterates
   converge (dx -> 0 satisfies every dual-infeasibility condition at
   enhancements.py:116-138, and dy, dlam -> 0 satisfies the primal one at
   :145-158, since `dual_combo ~ 0 > -tol`), mislabelling slow feasible
   solves.  Normalising the ray and requiring strict descent/ascent
   (c'r <= -tol, resp. ray dual objective >= tol) removes the trivial pass:
   a zero difference yields a zero normalised ray which fails the strict
   condition.
2. The reference's recession-cone test adds sign conditions on c
   (enhancements.py:133-135: u=+inf requires c_i >= 0) that the descent-ray
   variable can never satisfy (unboundedness needs c'dx < 0 concentrated on
   unbounded variables), so its DUAL_INFEASIBLE branch cannot fire on a
   genuinely unbounded LP.  The correct recession cone of [l, u] is used
   instead:  l finite & u = +inf  ->  dx_i >= 0;  l = -inf & u finite ->
   dx_i <= 0;  both finite -> dx_i = 0;  both infinite -> free.

The ray dual-objective rate uses the adjusted-dual pairing
q'dy + l'(dlam)_+ + u'(dlam)_- (matching the dual objective at
PDLP/helpers.py:81-84); the reference's two copies disagree on the dlam sign
convention (enhancements.py:111-112 vs experiments/InfeasibilityDetection3.py:398-399).

Also implemented: the normalized-iterate / normalized-average certificate
families from experiments/InfeasibilityDetection3.py:339-390.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpdlp.config import Status


def _normalize(v, norm):
    return jnp.where(norm > 0.0, v / jnp.where(norm > 0.0, norm, 1.0), 0.0)


def primal_ray_certifies(pb, r, k_r, tol):
    """Farkas conditions for a (unit-normalised) primal ray r with its
    product k_r = K r: A r ~ 0, G r >= -tol, strict descent c'r <= -tol,
    and recession-cone membership of [l, u]."""
    ineq = pb.ineq_mask
    eq_part = jnp.where(ineq, 0.0, k_r)
    ineq_part = jnp.where(ineq, k_r, jnp.inf)  # inf passes the >= -tol test

    equality_ok = jnp.linalg.norm(eq_part) <= tol
    inequality_ok = jnp.all(ineq_part >= -tol)
    objective_ok = jnp.dot(pb.c, r) <= -tol  # strict descent along the ray

    # Recession-cone membership of [l, u], vectorised.
    finite_both = ~pb.is_neg_inf & ~pb.is_pos_inf
    lo_only = ~pb.is_neg_inf & pb.is_pos_inf  # l finite, u = +inf
    hi_only = pb.is_neg_inf & ~pb.is_pos_inf  # l = -inf, u finite
    ok = jnp.where(finite_both, jnp.abs(r) <= tol, True)
    ok &= jnp.where(lo_only, r >= -tol, True)
    ok &= jnp.where(hi_only, r <= tol, True)
    bounds_ok = jnp.all(ok)
    return equality_ok & inequality_ok & objective_ok & bounds_ok


def dual_ray_certifies(pb, yr, lr, kt_yr, tol):
    """Farkas conditions for a (unit-normalised) dual ray (yr, lr) with
    kt_yr = K' yr: stationarity K'yr ~ lr, cone sign on inequality
    duals, and strictly positive dual-objective growth rate (the
    adjusted-dual pairing, PDLP/helpers.py:81-84)."""
    ineq = pb.ineq_mask
    dual_res_ok = jnp.linalg.norm(kt_yr - lr) <= tol
    dy_sign_ok = jnp.all(jnp.where(ineq, yr, 0.0) >= -tol)
    combo = (
        jnp.dot(pb.q, yr)
        + jnp.dot(pb.l_dual, jnp.maximum(lr, 0.0))
        + jnp.dot(pb.u_dual, jnp.minimum(lr, 0.0))
    )
    return dual_res_ok & dy_sign_ok & (combo >= tol)


def detect_infeasibility(
    pb,
    x, y, x_prev, y_prev,
    lam, lam_prev,
    k_dx,  # (m,)  K (x - x_prev), from carried products
    kt_dy,  # (n,)  K'(y - y_prev)
    tol,
):
    """Return an int32 status: RUNNING, DUAL_INFEASIBLE or PRIMAL_INFEASIBLE."""
    dx = x - x_prev
    dy = y - y_prev
    dlam = lam - lam_prev

    # ---- Dual infeasibility (primal unbounded ray) ----
    dx_norm = jnp.linalg.norm(dx)
    r = _normalize(dx, dx_norm)
    k_r = _normalize(k_dx, dx_norm)
    dual_infeasible = primal_ray_certifies(pb, r, k_r, tol)

    # ---- Primal infeasibility (dual unbounded ray) ----
    ray_norm = jnp.sqrt(jnp.vdot(dy, dy) + jnp.vdot(dlam, dlam))
    yr = _normalize(dy, ray_norm)
    lr = _normalize(dlam, ray_norm)
    kt_yr = _normalize(kt_dy, ray_norm)
    primal_infeasible = dual_ray_certifies(pb, yr, lr, kt_yr, tol)

    return jnp.where(
        dual_infeasible,
        jnp.int32(Status.DUAL_INFEASIBLE),
        jnp.where(
            primal_infeasible,
            jnp.int32(Status.PRIMAL_INFEASIBLE),
            jnp.int32(Status.RUNNING),
        ),
    )


def validate_normalized_candidate(pb, cert, x_ray, kx_ray, y_ray, kty_ray,
                                  tol):
    """Gate a normalized-family trigger behind the actual Farkas
    conditions (a deliberate fix over the reference's experiment, which
    declares on convergence alone: InfeasibilityDetection3.py:339-390).

    A CONVERGING solve passes the raw convergence+nonzero trigger in the
    whole window k in [sqrt(|z*|/tol_conv), |z*|/tol_nonzero) — e.g. a
    feasible LP whose y -> y* has ||y/k - y/(k-1)|| ~ ||y*||/k^2 below
    tol_conv long before ||y*||/k falls under tol_nonzero (measured: a
    planted-UNBOUNDED instance mislabelled PRIMAL_INFEASIBLE at k=35).
    The trigger's candidate ray is therefore only accepted when it
    certifies: DUAL_INFEASIBLE requires x_ray to be a Farkas primal ray,
    PRIMAL_INFEASIBLE requires (y_ray, proj(K'y_ray)) to be a Farkas
    dual ray.  Products come free from the carried kx/kty by linearity.
    """
    xr_norm = jnp.linalg.norm(x_ray)
    r = _normalize(x_ray, xr_norm)
    k_r = _normalize(kx_ray, xr_norm)
    ok_primal_ray = primal_ray_certifies(pb, r, k_r, tol)

    yr_norm = jnp.linalg.norm(y_ray)
    yr = _normalize(y_ray, yr_norm)
    kt_yr = _normalize(kty_ray, yr_norm)
    # The valid bound-multiplier recession cone is exactly the
    # lambda-projection cone; lr = proj(K'yr) makes the stationarity
    # check measure the distance of K'yr FROM that cone.
    lr = jnp.where(pb.is_neg_inf & pb.is_pos_inf, 0.0, kt_yr)
    lr = jnp.where(pb.is_neg_inf & ~pb.is_pos_inf,
                   jnp.minimum(lr, 0.0), lr)
    lr = jnp.where(~pb.is_neg_inf & pb.is_pos_inf,
                   jnp.maximum(lr, 0.0), lr)
    ok_dual_ray = dual_ray_certifies(pb, yr, lr, kt_yr, tol)

    keep = jnp.where(
        cert == jnp.int32(Status.DUAL_INFEASIBLE),
        ok_primal_ray,
        jnp.where(
            cert == jnp.int32(Status.PRIMAL_INFEASIBLE),
            ok_dual_ray,
            False,
        ),
    )
    return jnp.where(keep, cert, jnp.int32(Status.RUNNING))


def normalized_iterate_certificates(
    x, y, x_norm_prev, y_norm_prev, k, tol_conv=1e-4, tol_nonzero=1e-3
):
    """Normalized-iterate convergence certificates
    (experiments/InfeasibilityDetection3.py:339-364).

    x/k converging to a nonzero point => DUAL_INFEASIBLE;
    y/k converging to a nonzero point => PRIMAL_INFEASIBLE.
    Returns (status, x_norm, y_norm) where *_norm are this iteration's
    normalized iterates (to carry as next call's previous values).
    """
    kf = jnp.maximum(k.astype(x.dtype), 1.0)
    x_norm = x / kf
    y_norm = y / kf
    x_conv = jnp.linalg.norm(x_norm - x_norm_prev) < tol_conv
    x_nonzero = jnp.linalg.norm(x_norm) > tol_nonzero
    y_conv = jnp.linalg.norm(y_norm - y_norm_prev) < tol_conv
    y_nonzero = jnp.linalg.norm(y_norm) > tol_nonzero
    status = jnp.where(
        x_conv & x_nonzero,
        jnp.int32(Status.DUAL_INFEASIBLE),
        jnp.where(
            y_conv & y_nonzero,
            jnp.int32(Status.PRIMAL_INFEASIBLE),
            jnp.int32(Status.RUNNING),
        ),
    )
    return status, x_norm, y_norm


def normalized_average_certificates(
    x_sum, y_sum, x, y, k, tol_conv=1e-4, tol_nonzero=1e-3
):
    """Normalized-average convergence certificates
    (experiments/InfeasibilityDetection3.py:345-346,365-382).

    avg_k = 2 (sum_{i<=k} x_i) / (k (k+1)) converging to a nonzero point =>
    DUAL_INFEASIBLE (resp. on y => PRIMAL_INFEASIBLE).  The previous average
    is recovered from the running sum (avg_{k-1} = 2 (sum - x_k)/((k-1) k)),
    so the carry needs only the plain sums, not a second history vector.
    `x_sum`/`y_sum` must already include this iteration's x/y.
    """
    kf = jnp.maximum(k.astype(x.dtype), 2.0)
    avg_x = 2.0 * x_sum / (kf * (kf + 1.0))
    avg_y = 2.0 * y_sum / (kf * (kf + 1.0))
    prev_x = 2.0 * (x_sum - x) / ((kf - 1.0) * kf)
    prev_y = 2.0 * (y_sum - y) / ((kf - 1.0) * kf)
    x_conv = jnp.linalg.norm(avg_x - prev_x) < tol_conv
    x_nonzero = jnp.linalg.norm(avg_x) > tol_nonzero
    y_conv = jnp.linalg.norm(avg_y - prev_y) < tol_conv
    y_nonzero = jnp.linalg.norm(avg_y) > tol_nonzero
    return jnp.where(
        x_conv & x_nonzero,
        jnp.int32(Status.DUAL_INFEASIBLE),
        jnp.where(
            y_conv & y_nonzero,
            jnp.int32(Status.PRIMAL_INFEASIBLE),
            jnp.int32(Status.RUNNING),
        ),
    )
