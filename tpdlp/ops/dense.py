"""Dense constraint-matrix operator.

Replaces the reference's dense-tensor path (torch `K @ v` / `K.T @ w`,
PDLP/primal_dual_hybrid_gradient_step.py:25,33).  The transposed product is
expressed as a vector-matrix dot (`y @ K`) so XLA folds the transpose into
the matmul's dimension numbers instead of materialising K'.

Precision: all products request `Precision.HIGHEST` by default.  On TPU,
fp32 `dot_general` otherwise lowers to single-pass bf16 MXU multiplies
(~1e-3 relative error per matvec), which stalls high-accuracy solves —
measured on chip: tol=1e-8 on mittelmann-s converges in 58k KKT passes
with exact-fp32 products but exhausts a 138k-pass budget at a 4e-3 gap
with the default lowering.  Matvecs are HBM-bound, so the extra MXU
passes are free there.  `precision=None` (the compiler default) remains
available for throughput-bound matrix-matrix workloads that tolerate
bf16 accumulation (loose-tolerance shared-operator fleets).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from tpdlp.ops.base import LinOp

#: Exact-fp32 products (multi-pass on the MXU); the package-wide default.
HIGHEST = lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseOp(LinOp):
    mat: jax.Array  # (m, n)
    precision: lax.Precision | None = HIGHEST

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype

    def mv(self, x):
        return jnp.matmul(self.mat, x, precision=self.precision)

    def rmv(self, y):
        return jnp.matmul(y, self.mat, precision=self.precision)

    def mm(self, X):
        return jnp.matmul(self.mat, X, precision=self.precision)

    def rmm(self, Y):
        # (m, b)' K -> (b, n) -> transpose: K' Y as (n, b)
        return jnp.matmul(Y.T, self.mat, precision=self.precision).T

    def row_abs_norms(self, ord):
        a = jnp.abs(self.mat)
        if ord == "inf":
            return jnp.max(a, axis=1)
        return jnp.sum(a**ord, axis=1) ** (1.0 / ord)

    def col_abs_norms(self, ord):
        a = jnp.abs(self.mat)
        if ord == "inf":
            return jnp.max(a, axis=0)
        return jnp.sum(a**ord, axis=0) ** (1.0 / ord)

    def scale(self, d_row, d_col):
        # type(self): subclasses (test doubles, wrappers) must survive
        # scaling — the Ruiz loop carries the operator through while_loop,
        # where a class change breaks the carry pytree structure.
        return type(self)(
            self.mat * d_row[:, None] * d_col[None, :], self.precision
        )

    def astype(self, dtype):
        return type(self)(self.mat.astype(dtype), self.precision)

    def tree_flatten(self):
        return (self.mat,), (self.precision,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])
