"""Sparse constraint-matrix operator (BCOO, portable across backends).

Reference analog: the torch COO path chosen by `sparse_vs_dense`
(PDLP/util.py:29-74).  Both K and K' are materialised (the reference also
precomputes `A_transpose`, util.py:50,63) because transposed SpMV via
gathers is slow on every backend — a layout decision, not a copy.

Row/col norms for Ruiz scaling are computed with segment reductions over
the COO data — the reference needed a separate scatter-based sparse Ruiz
(Packages/PDLP_without_presolve_infeasibility.py:52-91); here the same
`LinOp` interface serves the dense and sparse paths.

For the TPU hot loop see tpdlp.ops.blocked (XLA block-ELL) and
tpdlp.ops.band (Pallas band slabs); this BCOO operator is the portable
fallback and the CPU sparse path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import sparse as jsparse

from tpdlp.ops.base import LinOp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseOp(LinOp):
    mat: jsparse.BCOO  # (m, n)
    mat_t: jsparse.BCOO  # (n, m), materialised transpose

    @classmethod
    def from_scipy(cls, K, dtype=jnp.float32) -> "SparseOp":
        K = K.tocoo()
        indices = jnp.stack(
            [jnp.asarray(K.row), jnp.asarray(K.col)], axis=1
        )
        data = jnp.asarray(K.data, dtype)
        mat = jsparse.BCOO((data, indices), shape=K.shape)
        Kt = K.T.tocoo()
        indices_t = jnp.stack(
            [jnp.asarray(Kt.row), jnp.asarray(Kt.col)], axis=1
        )
        mat_t = jsparse.BCOO(
            (jnp.asarray(Kt.data, dtype), indices_t),
            shape=(K.shape[1], K.shape[0]),
        )
        return cls(mat, mat_t)

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.data.dtype

    @property
    def nnz(self):
        return self.mat.nse

    def mv(self, x):
        return self.mat @ x

    def rmv(self, y):
        return self.mat_t @ y

    def mm(self, X):
        return self.mat @ X

    def rmm(self, Y):
        return self.mat_t @ Y

    def _abs_segment_norm(self, axis, ord):
        rows = self.mat.indices[:, 0]
        cols = self.mat.indices[:, 1]
        a = jnp.abs(self.mat.data)
        m, n = self.mat.shape
        seg = rows if axis == 1 else cols
        num = m if axis == 1 else n
        if ord == "inf":
            return jax.ops.segment_max(
                a, seg, num_segments=num, indices_are_sorted=False
            )
        s = jax.ops.segment_sum(a**ord, seg, num_segments=num)
        return s ** (1.0 / ord)

    def row_abs_norms(self, ord):
        return self._abs_segment_norm(axis=1, ord=ord)

    def col_abs_norms(self, ord):
        return self._abs_segment_norm(axis=0, ord=ord)

    def scale(self, d_row, d_col):
        rows = self.mat.indices[:, 0]
        cols = self.mat.indices[:, 1]
        data = self.mat.data * d_row[rows] * d_col[cols]
        mat = jsparse.BCOO((data, self.mat.indices), shape=self.mat.shape)
        rows_t = self.mat_t.indices[:, 0]
        cols_t = self.mat_t.indices[:, 1]
        data_t = self.mat_t.data * d_col[rows_t] * d_row[cols_t]
        mat_t = jsparse.BCOO(
            (data_t, self.mat_t.indices), shape=self.mat_t.shape
        )
        return SparseOp(mat, mat_t)

    def tree_flatten(self):
        return (self.mat, self.mat_t), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
