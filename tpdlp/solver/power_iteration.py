"""Spectral-norm estimation by power iteration on K'K.

Parity target: PDLP/helpers.py:41-51 (`spectral_norm_estimate_torch`) — the
reference runs 100 iterations at solver init (primal_dual_hybrid_gradient.py:22),
25 for the fishnet ball radius (spectral_casting.py:47) and 50 inside fishnet
init (:183).  Implemented as a jitted `lax.fori_loop`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spectral_norm_estimate(op, key, num_iters: int = 100):
    """||K||_2 estimate: num_iters power iterations of b <- K'(K b)."""
    n = op.shape[1]
    b0 = jax.random.normal(key, (n,), dtype=op.dtype)

    def body(_, b):
        b = op.rmv(op.mv(b))
        return b / jnp.linalg.norm(b)

    b = jax.lax.fori_loop(0, num_iters, body, b0)
    return jnp.linalg.norm(op.mv(b))
