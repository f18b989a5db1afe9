"""Fishnet / spectral-cast multi-point warm start.

Parity target: PDLP/spectral_casting.py:5-293.  Sample 2^i points on a
sphere of radius ~||K||_2 centred on the positive diagonal, run k batched
PDHG steps on the whole population, rank by duality gap, keep the best 1/s,
and on odd rounds re-breed new points as random convex combinations of the
survivors plus their midpoint, until one point remains.

TPU-native design: the population lives as (n, J) / (m, J) matrices and
every PDHG step is a matrix-matrix product on the MXU (the reference
already batches the step, spectral_casting.py:254-293, but evaluates the
duality gap with a per-point Python loop, :223-234 — here the gap of all
points is one batched expression).  The round schedule (population sizes
32 -> 16 -> 16 -> 8 -> ... -> 1 for s=2, i=5) is deterministic, so the
whole search compiles as one jitted program with static shapes per round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpdlp.solver.power_iteration import spectral_norm_estimate
from tpdlp.solver.residuals import project_lambda_box


def _round_schedule(j: int, s: int) -> list[tuple[int, int, bool]]:
    """[(j_in, j_keep, breed_to_j_in)] per round, mirroring the reference's
    while-loop parity rules (spectral_casting.py:104-157)."""
    sched = []
    i = 0
    while j > 1:
        keep = max(1, j // s)
        breed = (i % 2 == 1) and keep > 1
        sched.append((j, keep, breed))
        j = j if breed else keep
        i += 1
    return sched


def _batched_gap(op, pts, pts_y, c, q, l_dual, u_dual, is_neg_inf, is_pos_inf):
    """Duality gap of every column point in one batched expression
    (vectorises spectral_casting.py:191-252)."""
    grad = c[:, None] - op.rmm(pts_y)  # (n, J)
    lam = project_lambda_box(
        grad, is_neg_inf[:, None], is_pos_inf[:, None]
    )
    prim_obj = c @ pts  # (J,)
    dual_obj = q @ pts_y
    lam_pos = l_dual @ jnp.maximum(lam, 0.0)
    lam_neg = u_dual @ jnp.minimum(lam, 0.0)
    return (dual_obj + lam_pos + lam_neg) - prim_obj


def _pdhg_steps(op, pts, pts_y, c, q, l, u, ineq_mask, eta, omega, k: int):
    """k batched PDHG steps on the population (spectral_casting.py:254-293;
    theta = 1 extrapolation written as 2x - x_old there)."""

    def body(_, carry):
        pts, pts_y = carry
        grad = c[:, None] - op.rmm(pts_y)
        new = jnp.clip(pts - (eta / omega) * grad, l[:, None], u[:, None])
        x_bar = 2.0 * new - pts
        y_new = pts_y + eta * omega * (q[:, None] - op.mm(x_bar))
        y_new = jnp.where(
            ineq_mask[:, None], jnp.maximum(y_new, 0.0), y_new
        )
        return new, y_new

    return jax.lax.fori_loop(0, k, body, (pts, pts_y))


def spectral_cast(
    op, c, q, l, u, m_ineq: int,
    k: int = 32, s: int = 2, i: int = 5,
    seed: int = 0,
):
    """Return a promising (x0, y0) warm-start pair (reference entry:
    spectral_casting.py:5-29).  All compute jitted; host only orchestrates
    the static round schedule."""
    m, n = op.shape
    dtype = c.dtype
    key = jax.random.PRNGKey(seed)
    k_radius, k_pts, k_breed = jax.random.split(key, 3)

    j0 = 2**i
    sched = _round_schedule(j0, s)

    @jax.jit
    def init(k_radius, k_pts):
        # Ball radius ~ ||K||_2 (25 power iters, spectral_casting.py:47);
        # eta/omega init with a 50-iter estimate (:161-189).
        r = spectral_norm_estimate(op, k_radius, 25)
        pts = jax.random.normal(k_pts, (n, j0), dtype=dtype)
        pts = pts * r / jnp.linalg.norm(pts, axis=0, keepdims=True)
        centre = (r / jnp.sqrt(jnp.asarray(n, dtype))) * jnp.ones(
            (n, 1), dtype
        )
        pts = pts + centre
        pts_y = op.mm(pts)
        eta = 0.9 / spectral_norm_estimate(op, k_radius, 50)
        q_norm = jnp.linalg.norm(q)
        c_norm = jnp.linalg.norm(c)
        omega = jnp.where(
            (q_norm > 1e-6) & (c_norm > 1e-6), c_norm / q_norm,
            jnp.ones((), dtype),
        )
        return pts, pts_y, eta, omega

    pts, pts_y, eta, omega = init(k_radius, k_pts)

    ineq_mask = jnp.arange(m) < m_ineq
    is_neg_inf = jnp.isneginf(l)
    is_pos_inf = jnp.isposinf(u)
    l_dual = jnp.where(is_neg_inf, 0.0, l)
    u_dual = jnp.where(is_pos_inf, 0.0, u)

    @functools.partial(jax.jit, static_argnames=("keep", "breed"))
    def one_round(pts, pts_y, eta, omega, bkey, *, keep, breed):
        pts, pts_y = _pdhg_steps(
            op, pts, pts_y, c, q, l, u, ineq_mask, eta, omega, k
        )
        gap = _batched_gap(
            op, pts, pts_y, c, q, l_dual, u_dual, is_neg_inf, is_pos_inf
        )
        order = jnp.argsort(gap)[:keep]
        best = pts[:, order]
        best_y = pts_y[:, order]
        if not breed:
            return best, best_y
        # Odd-round repopulation (spectral_casting.py:117-154): random
        # convex combinations of the survivors, plus their midpoint.
        j_in = pts.shape[1]
        n_new = j_in - keep - 1
        w = jax.random.uniform(bkey, (keep, n_new), dtype=dtype)
        w = w / jnp.sum(w, axis=0, keepdims=True)
        combos = best @ w
        combos_y = best_y @ w
        mid = jnp.mean(best, axis=1, keepdims=True)
        mid_y = jnp.mean(best_y, axis=1, keepdims=True)
        return (
            jnp.concatenate([best, combos, mid], axis=1),
            jnp.concatenate([best_y, combos_y, mid_y], axis=1),
        )

    for ridx, (j_in, keep, breed) in enumerate(sched):
        bkey = jax.random.fold_in(k_breed, ridx)
        pts, pts_y = one_round(
            pts, pts_y, eta, omega, bkey, keep=keep, breed=breed
        )

    return pts[:, 0], pts_y[:, 0]
