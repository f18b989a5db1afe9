"""LP problem containers.

`LPProblem` is the host-side standard form (numpy / scipy.sparse), produced
by the MPS front-end or the generators:

    minimize    c'x
    s.t.        G x >= h,  A x = b,  l <= x <= u

stacked as K = [G; A], q = [h; b] with the first `m_ineq` rows inequalities
(reference form: PDLP/util.py:76-84,250-261).

`DeviceProblem` is the device-side pytree consumed by the jitted solver: the
(possibly scaled) operator + vectors, bound masks, the diagonal scaling
(identity when unscaled) and the original data needed for unscaled
termination (reference: PDLP/primal_dual_hybrid_gradient.py:157-163).
A key identity lets termination reuse the *scaled* operator: with
K_s = diag(d_row) K diag(d_col), x = x_s scaled iterate,

    K x_orig = (K_s x_s) / d_row      and      K' y_orig = (K_s' y_s) / d_col

so the original matrix never needs to live on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from tpdlp.ops.dense import DenseOp


@dataclasses.dataclass
class LPProblem:
    """Host-side standard-form LP (dense numpy or scipy.sparse K)."""

    c: np.ndarray  # (n,)
    K: Any  # (m, n) numpy array or scipy.sparse matrix
    q: np.ndarray  # (m,)
    m_ineq: int
    l: np.ndarray  # (n,)
    u: np.ndarray  # (n,)
    name: str = "lp"
    #: Constant objective offset from the MPS objective-row RHS entry
    #: (and from presolve-fixed variables).  Included in
    #: SolveResult.objective; the reference discards it.
    obj_offset: float = 0.0
    #: Original objective sense of the source file ("MIN"/"MAX").  The
    #: stored c is always minimization form (negated for MAX inputs);
    #: this flag lets results be reported in the original sense.
    objsense: str = "MIN"

    @property
    def shape(self) -> tuple[int, int]:
        return self.K.shape

    @property
    def n(self) -> int:
        return self.K.shape[1]

    @property
    def m(self) -> int:
        return self.K.shape[0]

    @property
    def m_eq(self) -> int:
        return self.m - self.m_ineq

    def validate(self) -> None:
        m, n = self.K.shape
        def _req(cond, msg):
            if not cond:
                raise ValueError(f"invalid LPProblem {self.name!r}: {msg}")
        _req(self.c.shape == (n,), f"c has shape {self.c.shape}, expected ({n},)")
        _req(self.q.shape == (m,), f"q has shape {self.q.shape}, expected ({m},)")
        _req(self.l.shape == (n,), f"l has shape {self.l.shape}, expected ({n},)")
        _req(self.u.shape == (n,), f"u has shape {self.u.shape}, expected ({n},)")
        _req(0 <= self.m_ineq <= m, f"m_ineq={self.m_ineq} outside [0, {m}]")
        bad = np.flatnonzero(~(self.l <= self.u))
        _req(bad.size == 0,
             f"box bounds l > u at variable indices {bad[:5].tolist()}")
        pinched_inf = np.flatnonzero(
            (self.l == self.u) & ~np.isfinite(self.l)
        )
        _req(pinched_inf.size == 0,
             "variables pinned at an infinite value (l == u == +-inf) at "
             f"indices {pinched_inf[:5].tolist()}")
        for label, v in (("c", self.c), ("q", self.q)):
            _req(np.all(np.isfinite(v)), f"non-finite entries in {label}")
        _req(not np.any(np.isnan(self.l)) and not np.any(np.isnan(self.u)),
             "NaN entries in bounds")


def _zeroed_at_inf(v, inf_mask):
    return jnp.where(inf_mask, 0.0, v)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceProblem:
    """Device-side problem pytree (scaled data + unscaled termination data)."""

    op: Any  # LinOp for the scaled K_s
    c: jax.Array  # (n,) scaled
    q: jax.Array  # (m,) scaled
    l: jax.Array  # (n,) scaled
    u: jax.Array  # (n,) scaled
    ineq_mask: jax.Array  # (m,) bool, True on inequality rows
    is_neg_inf: jax.Array  # (n,) bool, l == -inf
    is_pos_inf: jax.Array  # (n,) bool, u == +inf
    l_dual: jax.Array  # (n,) scaled l with -inf entries zeroed
    u_dual: jax.Array  # (n,) scaled u with +inf entries zeroed
    # Diagonal scaling (ones when unscaled): K_s = diag(d_row) K diag(d_col).
    d_row: jax.Array  # (m,)
    d_col: jax.Array  # (n,)
    # Original (unscaled) data for termination.
    c0: jax.Array
    q0: jax.Array
    l0_dual: jax.Array
    u0_dual: jax.Array
    # Termination norms (PDLP/primal_dual_hybrid_gradient.py:19-20).
    q_norm_term: jax.Array  # scalar
    c_norm_term: jax.Array  # scalar

    @property
    def n(self) -> int:
        return self.c.shape[0]

    @property
    def m(self) -> int:
        return self.q.shape[0]


def device_problem(
    op,
    c,
    q,
    l,
    u,
    m_ineq: int,
    *,
    d_row=None,
    d_col=None,
    c0=None,
    q0=None,
    l0=None,
    u0=None,
    ineq_mask=None,
    compat_scaled_norms: bool = True,
) -> DeviceProblem:
    """Assemble a DeviceProblem from (possibly scaled) arrays.

    When `d_row`/`d_col` are None the problem is unscaled and the original
    data coincides with the scaled data.  `ineq_mask` overrides the default
    prefix mask (used by padded/sharded layouts where zero-padded rows are
    marked as inequalities so their residual contribution vanishes).
    """
    m, n = op.shape
    dtype = c.dtype
    scaled = d_row is not None
    if not scaled:
        d_row = jnp.ones((m,), dtype)
        d_col = jnp.ones((n,), dtype)
        c0, q0, l0, u0 = c, q, l, u

    is_neg_inf = jnp.isneginf(l)
    is_pos_inf = jnp.isposinf(u)
    if ineq_mask is None:
        ineq_mask = jnp.arange(m) < m_ineq
    else:
        ineq_mask = jnp.asarray(ineq_mask)

    # Reference zeroes infinite bounds in the adjusted-dual inner products
    # (primal_dual_hybrid_gradient.py:14-17,159-160).
    l_dual = _zeroed_at_inf(l, is_neg_inf)
    u_dual = _zeroed_at_inf(u, is_pos_inf)
    l0_dual = _zeroed_at_inf(l0, is_neg_inf)
    u0_dual = _zeroed_at_inf(u0, is_pos_inf)

    # Reference computes termination norms from the data handed to the
    # algorithm — the *scaled* data when preconditioned (:19-20), even though
    # residuals are unscaled (:157-163).  compat_scaled_norms mirrors that.
    if compat_scaled_norms:
        q_norm_term = jnp.linalg.norm(q)
        c_norm_term = jnp.linalg.norm(c)
    else:
        q_norm_term = jnp.linalg.norm(q0)
        c_norm_term = jnp.linalg.norm(c0)

    return DeviceProblem(
        op=op,
        c=c,
        q=q,
        l=l,
        u=u,
        ineq_mask=ineq_mask,
        is_neg_inf=is_neg_inf,
        is_pos_inf=is_pos_inf,
        l_dual=l_dual,
        u_dual=u_dual,
        d_row=d_row,
        d_col=d_col,
        c0=c0,
        q0=q0,
        l0_dual=l0_dual,
        u0_dual=u0_dual,
        q_norm_term=q_norm_term,
        c_norm_term=c_norm_term,
    )


def triplet_transfer_wins(
    dense_elems: int, nnz: int, dtype, index_bytes: int = 8
) -> bool:
    """Is shipping COO triplets + on-device scatter cheaper than the dense
    host->device transfer?  `index_bytes` covers the integer coordinates
    per nonzero (8 = row+col int32; batched stacks add 4 for the batch
    index).  Requires a 2x margin so the device-side scatter and the extra
    dispatch are always amortised."""
    itemsize = jnp.dtype(dtype).itemsize
    return nnz * (index_bytes + itemsize) < dense_elems * itemsize // 2


def dense_op_for_backend(mat: jax.Array, exact: bool = True):
    """Wrap a built dense matrix in the right operator for this backend.

    On TPU with a <=32-bit dtype the solve path needs `ExactDenseOp`
    (Pallas VPU matvec): this backend's MXU dot is reduced-precision and
    ignores precision flags, which stalls tol<=1e-6 solves (see
    ops/pallas_dense.py).  `exact=False` keeps the plain MXU `DenseOp` —
    for vmapped fleets (no pallas-under-vmap) and GSPMD-sharded solves
    (XLA partitions dots, not pallas calls).
    """
    if (
        exact
        and jax.default_backend() == "tpu"
        and jnp.dtype(mat.dtype).itemsize <= 4
    ):
        from tpdlp.ops.pallas_dense import ExactDenseOp

        return ExactDenseOp.build(mat)
    return DenseOp(mat)


def to_device_arrays(problem: LPProblem, dtype=jnp.float32, *,
                     exact: bool = True):
    """Host LPProblem -> (DenseOp, c, q, l, u) device arrays.

    The single host->device transfer of a solve (reference analog:
    PDLP/util.py:240-246).  Sparse host matrices are densified ON DEVICE:
    shipping the COO triplets (12 bytes/nnz) instead of the dense array is
    a 100x+ transfer saving on remote-tunnel backends for the sparse
    instances that dominate LP practice, and the device-side scatter is
    trivial.  The sparse device path constructs its own operator
    (tpdlp.ops.sparse).
    """
    K = problem.K
    if hasattr(K, "toarray"):
        coo = K.tocoo()
        m, n = coo.shape
        if triplet_transfer_wins(m * n, coo.nnz, dtype):
            mat = (
                jnp.zeros((m, n), dtype)
                .at[jnp.asarray(coo.row), jnp.asarray(coo.col)]
                .add(jnp.asarray(coo.data, dtype))
            )
        else:
            mat = jnp.asarray(K.toarray(), dtype)
    else:
        mat = jnp.asarray(K, dtype)
    op = dense_op_for_backend(mat, exact)
    c = jnp.asarray(problem.c, dtype)
    q = jnp.asarray(problem.q, dtype)
    l = jnp.asarray(problem.l, dtype)
    u = jnp.asarray(problem.u, dtype)
    return op, c, q, l, u
