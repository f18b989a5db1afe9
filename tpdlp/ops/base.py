"""Abstract linear operator for the constraint matrix."""

from __future__ import annotations

import jax


class LinOp:
    """A (m, n) linear operator K with the SpMV pair.

    Subclasses are registered JAX pytrees so operators can flow through jit /
    vmap / shard_map and live inside `lax.while_loop` carries.
    """

    @property
    def shape(self) -> tuple[int, int]:
        raise NotImplementedError

    @property
    def dtype(self):
        raise NotImplementedError

    def mv(self, x):
        """K @ x: (n,) -> (m,)."""
        raise NotImplementedError

    def rmv(self, y):
        """K' @ y: (m,) -> (n,)."""
        raise NotImplementedError

    # Throughput variants for the PDHG step products (cfg.step_products):
    # an operator may offer a faster, slightly-noisier product path for
    # the iteration while mv/rmv stay the exact-certification path (see
    # ops/pallas_dense.py::ExactDenseOp, the TPU case).  Default: same.
    def mv_fast(self, x):
        return self.mv(x)

    def rmv_fast(self, y):
        return self.rmv(y)

    @property
    def has_fast_products(self) -> bool:
        """True when mv_fast/rmv_fast differ from mv/rmv (then restart
        checks must refresh carried products via the exact path before
        certifying termination — loop.py::_fresh_products)."""
        return False

    # Batched variants over a trailing point axis (used by the restart
    # metric batch and the fishnet warm start).  Default: vmap.
    def mm(self, X):
        """K @ X: (n, b) -> (m, b)."""
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(X)

    def rmm(self, Y):
        """K' @ Y: (m, b) -> (n, b)."""
        return jax.vmap(self.rmv, in_axes=1, out_axes=1)(Y)

    def row_abs_norms(self, ord):
        """Per-row norms of |K| (inf or a power p) — used by scaling."""
        raise NotImplementedError

    def col_abs_norms(self, ord):
        raise NotImplementedError

    def scale(self, d_row, d_col) -> "LinOp":
        """Return the operator diag(d_row) K diag(d_col)."""
        raise NotImplementedError
