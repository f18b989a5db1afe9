"""Diagonal preconditioning: Ruiz equilibration and Pock-Chambolle scaling.

Parity target: PDLP/enhancements.py:4-71 (`ruiz_precondition`): iterate
    d_row /= sqrt(rowmax |K_s|),  d_col /= sqrt(colmax |K_s|)
accumulating reciprocals so that K_s = diag(d_row) K diag(d_col), and scale
    c_s = c * d_col,  q_s = q * d_row,  l_s = l / d_col,  u_s = u / d_col
(unscale: x = d_col * x_s, y = d_row * y_s, used at
primal_dual_hybrid_gradient.py:158-161).

Known reference quirk (enhancements.py:60-61): its convergence test checks
`row_norms` twice and never `col_norms`; here the check tests both (the
correct Ruiz criterion).  With the default 20 iterations this rarely changes
the outcome.

Pock-Chambolle (alpha) scaling — not present in the reference, standard in
PDLP proper — divides rows by ||K_i.||_{2-alpha}^(1/2) and columns by
||K_.j||_alpha^(1/2); `scaling="ruiz+pc"` composes it after Ruiz.

All jitted; operators are scaled through `LinOp.scale`, so the same code
serves the dense and sparse paths (the reference needed a separate
scatter-based sparse Ruiz, PDLP_without_presolve_infeasibility.py:52-91).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe(v, eps):
    return jnp.where(v < eps, 1.0, v)


def ruiz_equilibrate(op, max_iter: int = 20, eps: float = 1e-6):
    """Run Ruiz iterations; returns (op_scaled, d_row, d_col)."""
    m, n = op.shape
    dtype = op.dtype
    d_row0 = jnp.ones((m,), dtype)
    d_col0 = jnp.ones((n,), dtype)

    def cond(carry):
        _, _, _, i, converged = carry
        return (i < max_iter) & ~converged

    def body(carry):
        cur, d_row, d_col, i, _ = carry
        row_norms = _safe(jnp.sqrt(cur.row_abs_norms("inf")), eps)
        d_row = d_row / row_norms
        cur = cur.scale(1.0 / row_norms, jnp.ones((n,), dtype))
        col_norms = _safe(jnp.sqrt(cur.col_abs_norms("inf")), eps)
        d_col = d_col / col_norms
        cur = cur.scale(jnp.ones((m,), dtype), 1.0 / col_norms)
        converged = (jnp.max(jnp.abs(1.0 - row_norms)) < eps) & (
            jnp.max(jnp.abs(1.0 - col_norms)) < eps
        )
        return cur, d_row, d_col, i + 1, converged

    out, d_row, d_col, _, _ = jax.lax.while_loop(
        cond, body, (op, d_row0, d_col0, jnp.int32(0), jnp.asarray(False))
    )
    return out, d_row, d_col


def pock_chambolle(op, alpha: float = 1.0, eps: float = 1e-6):
    """Pock-Chambolle diagonal scaling on top of an (already scaled) op."""
    row = _safe(jnp.sqrt(op.row_abs_norms(2.0 - alpha)), eps)
    col = _safe(jnp.sqrt(op.col_abs_norms(alpha)), eps)
    d_row = 1.0 / row
    d_col = 1.0 / col
    return op.scale(d_row, d_col), d_row, d_col


def scale_problem(op, c, q, l, u, *, method: str, ruiz_iters=20, ruiz_eps=1e-6,
                  pc_alpha=1.0):
    """Scale (K, c, q, l, u); returns (op_s, c_s, q_s, l_s, u_s, d_row, d_col).

    d_row/d_col satisfy K_s = diag(d_row) K diag(d_col); identity when
    method == "none".
    """
    m, n = op.shape
    dtype = op.dtype
    d_row = jnp.ones((m,), dtype)
    d_col = jnp.ones((n,), dtype)
    if method == "none":
        return op, c, q, l, u, d_row, d_col
    if method not in ("ruiz", "ruiz+pc"):
        raise ValueError(f"unknown scaling method: {method!r}")

    op, d_row, d_col = ruiz_equilibrate(op, ruiz_iters, ruiz_eps)
    if method == "ruiz+pc":
        op, dr2, dc2 = pock_chambolle(op, pc_alpha, ruiz_eps)
        d_row = d_row * dr2
        d_col = d_col * dc2

    c_s = c * d_col
    q_s = q * d_row
    l_s = l / d_col
    u_s = u / d_col
    return op, c_s, q_s, l_s, u_s, d_row, d_col
