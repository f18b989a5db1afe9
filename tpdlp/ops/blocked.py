"""Block-ELL sparse layout for TPU SpMV.

The TPU-native sparse representation (SURVEY.md §7: "block-ELL/CSR layouts
for K and K'").  The matrix is cut into (8, 128) tiles — the fp32
sublane x lane register shape — and each strip of 8 rows stores only its
nonempty tiles, padded to the strip-wise maximum count W (ELL).  Storage:

    tiles:   (mb, W, 8, 128)  fp32   (zero-padded)
    col_idx: (mb, W)          int32  (column-block index per slot; padding
                                      slots point at block 0 with zero tiles)

SpMV then is, per row strip i:  y[8i:8i+8] = sum_w tiles[i, w] @ x_blk[col_idx[i, w]]

Execution is one XLA gather + einsum over the whole product — no custom
kernel: it fuses with the surrounding iteration and XLA pipelines the HBM
streaming.  A hand-written Pallas kernel over the same arrays
(scalar-prefetched indices, double-buffered DMA) was benchmarked against
this path in rounds 1-2 and lost decisively (~11% of HBM peak vs 58% —
Mosaic cannot double-buffer the data-dependent block gathers as well as
XLA pipelines them), so it was REMOVED; general unstructured sparsity
uses this XLA path, and structured (banded) sparsity uses the production
Pallas band-slab kernel in tpdlp.ops.band.  BASELINE.md records the
measurement and the decision.

Both K and K' are materialised in this layout (transposed gathers are
hostile on TPU; the reference also precomputes its transpose,
PDLP/util.py:50,63).

Precision caveat: the tile einsum goes through the backend's MXU dot,
which on the axon TPU is reduced-precision (~1e-5 relative) and ignores
`Precision.HIGHEST` (see ops/dense.py).  Unlike the dense and band
layouts this op has no exact-fp32 twin (the Pallas ELL kernel lost
decisively and was removed), so block-ELL certification on that backend
is sound for tol >= ~1e-4 only; tighter tolerances on unstructured
sparse route through iterative refinement whose fp64 HOST residuals are
the judge (solver/refine.py) — the device products only need to be good
enough for the inner solves' loose tolerances.

Bandwidth model: bytes/iteration ~ 2 * mb * W * 8 * 128 * 4; the layout
beats dense streaming whenever the achieved fill (nnz / padded entries)
beats the dense density — `fill_ratio()` reports it, and the autotuner
makes the call empirically.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpdlp.ops.base import LinOp

BR = 8  # rows per tile (fp32 sublane)
BC = 128  # cols per tile (lane)


@dataclasses.dataclass
class _EllData:
    tiles: np.ndarray  # (mb, W, BR, BC)
    col_idx: np.ndarray  # (mb, W) int32
    m: int
    n: int
    nnz: int


def _build_ell(K: sp.coo_matrix) -> _EllData:
    """Vectorised host-side layout build (no Python per-nnz loops)."""
    m, n = K.shape
    # Strip count rounded to a multiple of 8 so the Pallas kernel can emit
    # (8, 8) output blocks (sublane-divisible); extra strips are all-zero.
    mb = -(-(-(-m // BR)) // 8) * 8
    row = K.row.astype(np.int64)
    col = K.col.astype(np.int64)
    rb = row // BR
    cb = col // BC

    # Unique (row-block, col-block) pairs define the tiles.
    key = rb * ((n // BC) + 1 + 1) + cb
    uniq, tile_of_nnz = np.unique(key, return_inverse=True)
    ntiles = uniq.size
    tile_rb = (uniq // ((n // BC) + 2)).astype(np.int64)
    tile_cb = (uniq % ((n // BC) + 2)).astype(np.int64)

    # Slot position of each tile within its row strip.
    order = np.argsort(tile_rb, kind="stable")
    slot = np.empty(ntiles, dtype=np.int64)
    counts = np.bincount(tile_rb, minlength=mb)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot[order] = np.arange(ntiles) - np.repeat(starts, counts)
    W = max(1, int(counts.max()) if ntiles else 1)

    tiles = np.zeros((mb, W, BR, BC), dtype=np.float64)
    col_idx = np.zeros((mb, W), dtype=np.int32)
    col_idx[tile_rb, slot[np.arange(ntiles)]] = tile_cb.astype(np.int32)

    np.add.at(
        tiles,
        (rb, slot[tile_of_nnz], row % BR, col % BC),
        K.data,
    )
    return _EllData(tiles, col_idx, m, n, int(K.nnz))


def ell_stored_elems(K) -> int:
    """Stored tile elements (fwd + bwd) of the block-ELL layout for K,
    WITHOUT building the tiles — the cheap estimate that gates the host
    build (whose zero-padded float64 tile arrays can be tens of GB for
    scattered sparsity)."""
    K = K.tocoo() if sp.issparse(K) else sp.coo_matrix(np.asarray(K))
    total = 0
    for row, col, m, n in (
        (K.row, K.col, K.shape[0], K.shape[1]),
        (K.col, K.row, K.shape[1], K.shape[0]),
    ):
        mb = -(-(-(-m // BR)) // 8) * 8
        rb = row.astype(np.int64) // BR
        cb = col.astype(np.int64) // BC
        key = rb * ((n // BC) + 2) + cb
        uniq = np.unique(key)
        tile_rb = uniq // ((n // BC) + 2)
        counts = np.bincount(tile_rb, minlength=mb)
        W = max(1, int(counts.max()) if uniq.size else 1)
        total += mb * W * BR * BC
    return total


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _EllMat:
    """One block-ELL matrix (the mv direction); pytree of two arrays."""

    tiles: jax.Array  # (mb, W, BR, BC)
    col_idx: jax.Array  # (mb, W) int32
    m: int
    n: int

    def matvec(self, x):
        nb = -(-self.n // BC)
        # Identity when n is already a whole number of 128-lane blocks
        # (always true for mesh-padded problems — keeps sharded inputs
        # scatter-free so GSPMD only inserts the all-gather).
        if self.n == nb * BC:
            x_pad = x
        else:
            x_pad = jnp.zeros((nb * BC,), x.dtype).at[: self.n].set(x)
        x_blk = x_pad.reshape(nb, BC)
        gathered = x_blk[self.col_idx]  # (mb, W, BC)
        y = jnp.einsum(
            "bwrc,bwc->br",
            self.tiles.astype(x.dtype),
            gathered,
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return y.reshape(-1)[: self.m]

    def matmat(self, X):
        nb = -(-self.n // BC)
        b = X.shape[1]
        X_pad = jnp.zeros((nb * BC, b), X.dtype).at[: self.n].set(X)
        X_blk = X_pad.reshape(nb, BC, b)
        gathered = X_blk[self.col_idx]  # (mb, W, BC, b)
        Y = jnp.einsum(
            "bwrc,bwcj->brj",
            self.tiles.astype(X.dtype),
            gathered,
            preferred_element_type=X.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        return Y.reshape(-1, b)[: self.m]

    def tree_flatten(self):
        return (self.tiles, self.col_idx), (self.m, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockEllOp(LinOp):
    """LinOp over block-ELL layouts of K and K' (both materialised)."""

    fwd: _EllMat  # K
    bwd: _EllMat  # K'

    @classmethod
    def from_scipy(cls, K, dtype=jnp.float32, *, host: bool = False):
        """Build both directions.

        `host=True` keeps the tile arrays as HOST numpy: the sharded
        solve path then does ONE `jax.device_put` per leaf with the
        target NamedSharding, so no single device ever stages the whole
        operator (the >HBM single-LP and fp64-escalation-tail use cases
        this layout exists for)."""
        K = K.tocoo() if sp.issparse(K) else sp.coo_matrix(K)
        f = _build_ell(K)
        b = _build_ell(K.T.tocoo())
        if host:
            npdt = np.dtype(dtype)
            mk = lambda e: _EllMat(
                e.tiles.astype(npdt), np.asarray(e.col_idx, np.int32),
                e.m, e.n,
            )
        else:
            mk = lambda e: _EllMat(
                jnp.asarray(e.tiles, dtype), jnp.asarray(e.col_idx),
                e.m, e.n,
            )
        op = cls(mk(f), mk(b))
        op._nnz = f.nnz
        return op

    @property
    def shape(self):
        return (self.fwd.m, self.fwd.n)

    @property
    def dtype(self):
        return self.fwd.tiles.dtype

    def fill_ratio(self) -> float:
        """nnz / stored entries — the bandwidth advantage over dense."""
        stored = self.fwd.tiles.size
        return getattr(self, "_nnz", stored) / stored

    def mv(self, x):
        return self.fwd.matvec(x)

    def rmv(self, y):
        return self.bwd.matvec(y)

    def mm(self, X):
        return self.fwd.matmat(X)

    def rmm(self, Y):
        return self.bwd.matmat(Y)

    def row_abs_norms(self, ord):
        a = jnp.abs(self.fwd.tiles)
        if ord == "inf":
            per = jnp.max(a, axis=(1, 3))  # (mb, BR)
        else:
            per = jnp.sum(a**ord, axis=(1, 3)) ** (1.0 / ord)
        return per.reshape(-1)[: self.fwd.m]

    def col_abs_norms(self, ord):
        a = jnp.abs(self.bwd.tiles)
        if ord == "inf":
            per = jnp.max(a, axis=(1, 3))
        else:
            per = jnp.sum(a**ord, axis=(1, 3)) ** (1.0 / ord)
        return per.reshape(-1)[: self.bwd.m]

    def _scale_mat(self, mat: _EllMat, d_row, d_col):
        mb, W = mat.col_idx.shape
        if mat.m == mb * BR:
            dr_pad = d_row
        else:
            dr_pad = (
                jnp.zeros((mb * BR,), d_row.dtype).at[: mat.m].set(d_row)
            )
        nb = -(-mat.n // BC)
        if mat.n == nb * BC:
            dc_pad = d_col
        else:
            dc_pad = (
                jnp.zeros((nb * BC,), d_col.dtype).at[: mat.n].set(d_col)
            )
        dc_blk = dc_pad.reshape(nb, BC)[mat.col_idx]  # (mb, W, BC)
        tiles = (
            mat.tiles
            * dr_pad.reshape(mb, 1, BR, 1)
            * dc_blk[:, :, None, :]
        )
        return _EllMat(tiles, mat.col_idx, mat.m, mat.n)

    def scale(self, d_row, d_col):
        out = BlockEllOp(
            self._scale_mat(self.fwd, d_row, d_col),
            self._scale_mat(self.bwd, d_col, d_row),
        )
        out._nnz = getattr(self, "_nnz", None)
        return out

    def tree_flatten(self):
        return (self.fwd, self.bwd), (getattr(self, "_nnz", None),)

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = cls(children[0], children[1])
        op._nnz = aux[0]
        return op
