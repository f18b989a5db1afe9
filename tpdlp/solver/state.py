"""PDHG loop state — the `lax.while_loop` carry.

The reference keeps this state as Python locals mutated across its nested
while loops (PDLP/primal_dual_hybrid_gradient.py:31-66); here it is one
immutable pytree.  Beyond the reference's state we carry the SpMV products
K x and K'y of the current *and previous* iterate: with those, the adaptive
stepsize denominator (dy'K dx), the infeasibility certificates (K dx, K'dy)
and the restart KKT errors all become vector work instead of extra SpMVs —
one K x + one K'y per iteration total, versus the reference's 3-5
(step + certificate + restart passes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpdlp.config import Status


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PDHGState:
    # Current iterate and its operator products.
    x: jax.Array  # (n,)
    y: jax.Array  # (m,)
    kx: jax.Array  # (m,)  K x
    kty: jax.Array  # (n,)  K'y
    # Previous iterate (for the necessary restart criterion,
    # primal_dual_hybrid_gradient.py:77-78, and infeasibility diffs).
    x_prev: jax.Array
    y_prev: jax.Array
    kx_prev: jax.Array
    kty_prev: jax.Array
    # Previous projected reduced cost for infeasibility (enhancements.py:101).
    lam_prev: jax.Array  # (n,)
    # Previous normalized iterates x/k, y/k for the normalized-iterate
    # certificate family (experiments/InfeasibilityDetection3.py:339-364).
    x_norm_prev: jax.Array  # (n,)
    y_norm_prev: jax.Array  # (m,)
    # Plain running sums for the normalized-average certificate family
    # (experiments/InfeasibilityDetection3.py:345-346,365-382).
    x_plain_sum: jax.Array  # (n,)
    y_plain_sum: jax.Array  # (m,)
    # Their operator-product sums (K x_plain_sum, K' y_plain_sum by
    # linearity, one vector add per iteration) — the Farkas validation
    # of the normalized-average candidates needs the average's products.
    kx_plain_sum: jax.Array  # (m,)
    kty_plain_sum: jax.Array  # (n,)
    # eta-weighted running averages (primal_dual_hybrid_gradient.py:107-109).
    x_sum: jax.Array
    y_sum: jax.Array
    eta_sum: jax.Array  # scalar
    # Last restart point, for the primal-weight update (:63-64,150-151).
    # In the Halpern scheme this doubles as the anchor z0, so its operator
    # products are carried too; both restart variants maintain
    # kx_restart == K @ x_restart (vanilla never reads them, but the
    # invariant is kept so checkpoints can resume under either scheme).
    x_restart: jax.Array
    y_restart: jax.Array
    kx_restart: jax.Array
    kty_restart: jax.Array
    # Step sizes.
    eta: jax.Array  # scalar — stepsize for the *next* step
    omega: jax.Array  # scalar — primal weight
    # The initial primal weight, carried so the update clamp
    # (cfg.omega_clamp) has its anchor inside the jitted loop.
    omega_init: jax.Array  # scalar
    # Restart metric at the current restart cycle's start (:48,153).
    # Vanilla: the candidate KKT error after the last restart.  Halpern:
    # the omega-weighted fixed-point residual ||z - T(z)|| measured at the
    # first iteration after the restart (cuPDLP+-style criterion).
    kkt_first: jax.Array  # scalar
    # Current fixed-point residual (Halpern scheme only; 0 in vanilla).
    fp_res: jax.Array  # scalar
    # Counters (int32): total iters, inner iters, restarts, KKT passes.
    k: jax.Array
    t: jax.Array
    n_restarts: jax.Array
    j: jax.Array
    status: jax.Array  # int32 Status code
    # Reporting (updated at restart boundaries).
    prim_obj: jax.Array
    adjusted_dual: jax.Array
    primal_res: jax.Array
    dual_res: jax.Array
    gap: jax.Array

    def replace(self, **kw) -> "PDHGState":
        return dataclasses.replace(self, **kw)


def init_state(pb, eta0, omega0, x0=None, y0=None) -> PDHGState:
    """Initial carry (reference init: primal_dual_hybrid_gradient.py:31-51)."""
    n, m = pb.n, pb.m
    dtype = pb.c.dtype
    x = jnp.zeros((n,), dtype) if x0 is None else x0.astype(dtype)
    y = jnp.zeros((m,), dtype) if y0 is None else y0.astype(dtype)
    kx = pb.op.mv(x)
    kty = pb.op.rmv(y)
    zero = jnp.zeros((), dtype)
    return PDHGState(
        x=x,
        y=y,
        kx=kx,
        kty=kty,
        x_prev=x,
        y_prev=y,
        kx_prev=kx,
        kty_prev=kty,
        lam_prev=jnp.zeros((n,), dtype),
        x_norm_prev=jnp.zeros((n,), dtype),
        y_norm_prev=jnp.zeros((m,), dtype),
        x_plain_sum=jnp.zeros((n,), dtype),
        y_plain_sum=jnp.zeros((m,), dtype),
        kx_plain_sum=jnp.zeros((m,), dtype),
        kty_plain_sum=jnp.zeros((n,), dtype),
        x_sum=jnp.zeros((n,), dtype),
        y_sum=jnp.zeros((m,), dtype),
        eta_sum=zero,
        x_restart=x,
        y_restart=y,
        kx_restart=kx,
        kty_restart=kty,
        eta=jnp.asarray(eta0, dtype),
        omega=jnp.asarray(omega0, dtype),
        omega_init=jnp.asarray(omega0, dtype),
        # KKT_first starts at 0: the artificial criterion always fires the
        # first restart (reference comment at :48).
        kkt_first=zero,
        fp_res=zero,
        k=jnp.zeros((), jnp.int32),
        t=jnp.zeros((), jnp.int32),
        n_restarts=jnp.zeros((), jnp.int32),
        j=jnp.zeros((), jnp.int32),
        status=jnp.asarray(int(Status.RUNNING), jnp.int32),
        prim_obj=zero,
        adjusted_dual=zero,
        primal_res=zero,
        dual_res=zero,
        gap=zero,
    )
