"""Dense constraint-matrix operator.

Replaces the reference's dense-tensor path (torch `K @ v` / `K.T @ w`,
PDLP/primal_dual_hybrid_gradient_step.py:25,33).  The transposed product is
expressed as a vector-matrix dot (`y @ K`) so XLA folds the transpose into
the matmul's dimension numbers instead of materialising K'.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpdlp.ops.base import LinOp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseOp(LinOp):
    mat: jax.Array  # (m, n)

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype

    def mv(self, x):
        return self.mat @ x

    def rmv(self, y):
        return y @ self.mat

    def mm(self, X):
        return self.mat @ X

    def rmm(self, Y):
        # (m, b)' K -> (b, n) -> transpose: K' Y as (n, b)
        return (Y.T @ self.mat).T

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
        return DenseOp(self.mat * d_row[:, None] * d_col[None, :])

    def astype(self, dtype):
        return DenseOp(self.mat.astype(dtype))

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
