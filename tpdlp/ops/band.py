"""Band-slab sparse layout: the TPU speed-of-light path for banded K.

Block-ELL (tpdlp.ops.blocked) is the general structured-sparse layout, but
its per-tile gathers are scalar-indexed work the VPU cannot hide — on the
real chip the gather/index overhead caps the stream at ~25% of HBM peak
(XLA path) / ~11% (per-tile Pallas kernel).  For BANDED matrices — the one
sparsity class where sparse beats dense on TPU at all — there is a layout
with NO per-tile indices:

    group g = GR consecutive 8-row strips (GR*8 rows), whose band columns
    all fall inside one window [start_g, start_g + WB):

        slab_g : (GR*8, WB) dense   (zero-padded outside the band)
        start_g: int32              (the only dynamic index per group)

    y[g] = slab_g @ x[start_g : start_g + WB]

One dynamic slice of x per GRID STEP (vs W gathers per 8-row strip for
ELL), everything else static VPU work: elementwise multiply + lane-tree
reduction over the window.  The Pallas kernel streams slabs HBM->VMEM
double-buffered with `start_g` scalar-prefetched; x stays fully VMEM
resident (fine up to n ~ 3M fp32).

The layout applies whenever every group's column span fits one window
(`from_scipy` returns None otherwise and the caller falls back to
block-ELL).  K and K' are both materialised — the transpose of a banded
matrix is banded with the same bandwidth.

Reference analog: the reference has no sparse path at all (torch dense
mm, PDLP/util.py:50,63); SURVEY.md §7's "fused_step / block-ELL" kernel
plan is realized here as the band-slab kernel, which is the case where a
hand kernel actually beats XLA.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdlp.ops.base import LinOp

BR = 8  # rows per strip (fp32 sublane)
LANES = 128
GB = 8  # groups per grid step (keeps every block 8/128-divisible)


def _ceil(a, b):
    return -(-a // b)


@dataclasses.dataclass
class _BandData:
    slabs: np.ndarray  # (ngroups, GR*BR, WB)
    starts: np.ndarray  # (ngroups,) int32, multiples of LANES
    m: int
    n: int
    nnz: int


def _band_layout(row, col, m, n, group_rows: int, max_window: int):
    """Window layout of one direction: (ngroups, WB, starts), or None when
    some group's column span exceeds the window budget.

    Window starts are 128-aligned (lane-aligned x slices keep Mosaic from
    relayout shuffles); the group count pads to a multiple of GB so grid
    steps process whole GB-group stripes.
    """
    ngroups = _ceil(_ceil(m, group_rows), GB) * GB
    grp = row // group_rows
    lo = np.full(ngroups, n, dtype=np.int64)
    hi = np.full(ngroups, 0, dtype=np.int64)
    np.minimum.at(lo, grp, col)
    np.maximum.at(hi, grp, col)
    empty = lo > hi
    lo[empty] = 0
    hi[empty] = 0
    start = (lo // LANES) * LANES
    span = hi - start + 1
    wb = int(span.max()) if span.size else 1
    WB = _ceil(wb, LANES) * LANES
    if WB > max_window:
        return None
    n_pad = _ceil(n, LANES) * LANES
    WB = min(WB, n_pad)
    start = np.minimum(start, n_pad - WB)
    return ngroups, WB, start


def _build_band(K: sp.coo_matrix, group_rows: int, max_window: int,
                dtype=None, device_build: bool = False):
    """Layout build; None when some group's span exceeds the window budget
    (caller falls back to ELL).

    `device_build=True` assembles the slabs ON DEVICE by a flat COO
    scatter (12 bytes/nnz shipped instead of the full zero-padded slab
    array — 3-4x less host->device traffic for real band densities, and
    no host-side dense intermediate).
    """
    m, n = K.shape
    rows_per_group = group_rows
    row = K.row.astype(np.int64)
    col = K.col.astype(np.int64)
    lay = _band_layout(row, col, m, n, rows_per_group, max_window)
    if lay is None:
        return None
    ngroups, WB, start = lay
    grp = row // rows_per_group

    if device_build:
        flat = (grp * rows_per_group + row % rows_per_group) * WB + (
            col - start[grp]
        )
        total = ngroups * rows_per_group * WB
        slabs = (
            jnp.zeros((total,), dtype)
            .at[jnp.asarray(flat, jnp.int32 if total < 2**31
                            else jnp.int64)]
            .add(jnp.asarray(K.data, dtype))
            .reshape(ngroups, rows_per_group, WB)
        )
    else:
        slabs = np.zeros((ngroups, rows_per_group, WB), dtype=np.float64)
        np.add.at(
            slabs,
            (grp, row % rows_per_group, col - start[grp]),
            K.data,
        )
    return _BandData(slabs, start.astype(np.int32), m, n, int(K.nnz))


def band_stored_elems(K, group_rows=None, max_window=None):
    """Stored slab elements (fwd + bwd) of the band layout for K, WITHOUT
    building the slabs — the cheap size estimate the fp64 program-size
    guard needs.  None when K is not band-like (either direction)."""
    K = K.tocoo() if sp.issparse(K) else sp.coo_matrix(np.asarray(K))
    gr = group_rows or BandOp.GROUP_ROWS
    mw = max_window or BandOp.MAX_WINDOW
    total = 0
    for row, col, m, n in (
        (K.row, K.col, K.shape[0], K.shape[1]),
        (K.col, K.row, K.shape[1], K.shape[0]),
    ):
        lay = _band_layout(
            row.astype(np.int64), col.astype(np.int64), m, n, gr, mw
        )
        if lay is None:
            return None
        ngroups, WB, _ = lay
        total += ngroups * gr * WB
    return total


def _band_kernel(slab_ref, xw_ref, y_ref):
    _, R, WB = slab_ref.shape
    # (GB, R, WB) * (GB, 1, WB) -> lane-tree reduce over the window.  All
    # indexing is static: the x windows were gathered OUTSIDE the kernel
    # (Mosaic requires 1024-aligned dynamic 1D loads, and aligning the
    # windows would inflate stored bytes ~3x; the window gather is ~1.5%
    # of slab traffic).
    xw = xw_ref[:, :]
    slab = slab_ref[:, :, :]
    # Accumulate lane-block partial products (static unroll over the few
    # window blocks), then one trailing-axis reduce — Mosaic supports
    # single-trailing-dim reductions only.
    acc = jnp.zeros((GB, R, LANES), slab.dtype)
    for b in range(WB // LANES):
        sl = slab[:, :, b * LANES:(b + 1) * LANES]
        xb = xw[:, b * LANES:(b + 1) * LANES].reshape(GB, 1, LANES)
        acc = acc + sl * xb
    y_ref[:] = jnp.sum(acc, axis=2).reshape(GB * R)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _band_matvec_pallas(slabs, xwin, *, interpret=False):
    ngroups, R, WB = slabs.shape
    assert ngroups % GB == 0, ngroups
    with jax.enable_x64(False):
        grid_spec = pl.GridSpec(
            grid=(ngroups // GB,),
            in_specs=[
                # Slab stripe streams HBM->VMEM, double-buffered by the
                # BlockSpec pipeline.
                pl.BlockSpec(
                    (GB, R, WB),
                    lambda g: (g, 0, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (GB, WB),
                    lambda g: (g, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (GB * R,),
                lambda g: (g,),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
        )
        y = pl.pallas_call(
            _band_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ngroups * R,), slabs.dtype),
            interpret=interpret,
        )(slabs, xwin)
    return y


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class _BandMat:
    """One band-slab matrix (the mv direction)."""

    slabs: jax.Array  # (ngroups, GR*BR, WB)
    starts: jax.Array  # (ngroups,) int32
    m: int
    n: int

    def _x_pad(self, x):
        n_pad = _ceil(self.n, LANES) * LANES
        if self.n == n_pad:
            return x
        return jnp.zeros((n_pad,), x.dtype).at[: self.n].set(x)

    def _windows(self, x):
        """(ngroups, WB) contiguous window gather of x (tiny vs slabs).

        Starts are 128-aligned by construction, so the gather indexes
        whole 128-lane BLOCKS — element-indexed gathers measured ~5x
        slower on TPU for the same windows."""
        x_pad = self._x_pad(x)
        WB = self.slabs.shape[2]
        x_blk = x_pad.reshape(-1, LANES)
        blk_idx = (self.starts // LANES)[:, None] + jnp.arange(
            WB // LANES, dtype=jnp.int32
        )[None]
        return x_blk[blk_idx].reshape(self.starts.shape[0], WB)

    def matvec_xla(self, x):
        """Portable path: windowed take + einsum (CPU tests, fallback)."""
        y = jnp.einsum(
            "grw,gw->gr",
            self.slabs.astype(x.dtype),
            self._windows(x),
            preferred_element_type=x.dtype,
            # Exact-fp32 contraction: the TPU default is single-pass bf16
            # on the MXU, which stalls 1e-8 solves (see ops/dense.py).
            # The window contraction is HBM-bound, so this is free.
            precision=jax.lax.Precision.HIGHEST,
        )
        return y.reshape(-1)[: self.m]

    def matvec(self, x, *, use_pallas: bool = True):
        """y = M x.  The Pallas kernel runs only on real TPU AND when the
        caller allows it (sharded operators must use the partitionable
        take+einsum path); everywhere else -> matvec_xla.  fp64 inputs
        also route to XLA — Mosaic has no fp64 vector path, so the kernel
        would fail to lower on chip (the XLA path runs in the backend's
        emulated fp64)."""
        if (
            not use_pallas
            or jax.default_backend() != "tpu"
            or jnp.dtype(x.dtype).itemsize > 4
            or jnp.dtype(self.slabs.dtype).itemsize > 4
        ):
            return self.matvec_xla(x)
        y = _band_matvec_pallas(
            self.slabs.astype(x.dtype), self._windows(x)
        )
        return y.reshape(-1)[: self.m]

    def matmat(self, X):
        return jax.vmap(self.matvec_xla, in_axes=1, out_axes=1)(X)

    def tree_flatten(self):
        return (self.slabs, self.starts), (self.m, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BandOp(LinOp):
    """LinOp over band-slab layouts of K and K' (both materialised).

    `use_pallas=False` forces the portable take+einsum path — required
    when the operator is SHARDED over a mesh (GSPMD partitions XLA
    gathers/einsums but not custom Pallas kernels)."""

    fwd: _BandMat  # K
    bwd: _BandMat  # K'
    use_pallas: bool = True

    #: Default per-group window cap: 16 lane blocks = 2048 columns.  Wider
    #: bands stop being "banded" for bandwidth purposes (stored bytes
    #: approach dense) — the builder bails and the autotuner falls back.
    MAX_WINDOW = 2048
    GROUP_ROWS = 128  # 16 strips x 8 rows per grid step

    @classmethod
    def from_scipy(cls, K, dtype=jnp.float32, *, group_rows=None,
                   max_window=None, device_build: bool = True,
                   host: bool = False):
        """Build both directions; None if either side is not band-like.

        `device_build` (default) ships COO triplets and scatters the
        slabs on device; False keeps the host numpy build.  `host=True`
        (implies device_build=False) returns HOST numpy slab arrays so
        the sharded path can `jax.device_put` each leaf straight to its
        target NamedSharding without staging the whole operator through
        one device."""
        K = K.tocoo() if sp.issparse(K) else sp.coo_matrix(np.asarray(K))
        gr = group_rows or cls.GROUP_ROWS
        mw = max_window or cls.MAX_WINDOW
        if host:
            device_build = False
        f = _build_band(K, gr, mw, dtype=dtype, device_build=device_build)
        if f is None:
            return None
        b = _build_band(K.T.tocoo(), gr, mw, dtype=dtype,
                        device_build=device_build)
        if b is None:
            return None
        if host:
            npdt = np.dtype(dtype)
            mk = lambda e: _BandMat(
                np.asarray(e.slabs, npdt), np.asarray(e.starts, np.int32),
                e.m, e.n,
            )
        else:
            mk = lambda e: _BandMat(
                jnp.asarray(e.slabs, dtype), jnp.asarray(e.starts),
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
        return self.fwd.slabs.dtype

    def stored_bytes(self) -> int:
        """Streamed bytes per mv+rmv pair (the roofline byte model)."""
        item = jnp.dtype(self.dtype).itemsize
        return (self.fwd.slabs.size + self.bwd.slabs.size) * item

    def fill_ratio(self) -> float:
        return getattr(self, "_nnz", 0) / max(1, self.fwd.slabs.size)

    def mv(self, x):
        return self.fwd.matvec(x, use_pallas=self.use_pallas)

    def rmv(self, y):
        return self.bwd.matvec(y, use_pallas=self.use_pallas)

    #: Throughput step products (cfg.step_products, see ops/base.py).
    #: Inside a blocked cycle XLA keeps the take+einsum path's slab
    #: arrays VMEM-RESIDENT when they fit (v5e: 128 MB VMEM), which the
    #: per-call Pallas kernel can never be — measured on the 16384^2
    #: bandwidth-145 fixture (51 MB slabs): einsum-resident 49.5k it/s
    #: vs pallas-streaming 14.9k (tol=1e-4 blocked solve, same k).  The
    #: einsum is reduced-precision on this backend (the MXU dot ignores
    #: precision flags), so it serves STEPS only; mv/rmv stay the exact
    #: VPU kernel and restart checks refresh carried products through
    #: them (loop.py::_fresh_products).  Above the VMEM budget the
    #: einsum would just stream slower than the kernel (473 vs 613-680
    #: GB/s), so fast falls back to exact there.
    _FAST_VMEM_BUDGET = 100 * 1024 * 1024

    def _fast_ok(self) -> bool:
        return (
            self.use_pallas
            and jax.default_backend() == "tpu"
            and jnp.dtype(self.dtype).itemsize <= 4
            and self.stored_bytes() <= self._FAST_VMEM_BUDGET
        )

    def mv_fast(self, x):
        if self._fast_ok():
            return self.fwd.matvec_xla(x)
        return self.mv(x)

    def rmv_fast(self, y):
        if self._fast_ok():
            return self.bwd.matvec_xla(y)
        return self.rmv(y)

    @property
    def has_fast_products(self) -> bool:
        return self._fast_ok()

    def mm(self, X):
        return self.fwd.matmat(X)

    def rmm(self, Y):
        return self.bwd.matmat(Y)

    def row_abs_norms(self, ord):
        a = jnp.abs(self.fwd.slabs)
        if ord == "inf":
            per = jnp.max(a, axis=2)
        else:
            per = jnp.sum(a**ord, axis=2) ** (1.0 / ord)
        return per.reshape(-1)[: self.fwd.m]

    def col_abs_norms(self, ord):
        a = jnp.abs(self.bwd.slabs)
        if ord == "inf":
            per = jnp.max(a, axis=2)
        else:
            per = jnp.sum(a**ord, axis=2) ** (1.0 / ord)
        return per.reshape(-1)[: self.bwd.m]

    def _scale_mat(self, mat: _BandMat, d_row, d_col):
        ngroups, R, WB = mat.slabs.shape
        if mat.m == ngroups * R:
            dr = d_row
        else:
            dr = jnp.zeros((ngroups * R,), d_row.dtype).at[: mat.m].set(
                d_row
            )
        n_pad = _ceil(mat.n, LANES) * LANES
        if mat.n == n_pad:
            dc_pad = d_col
        else:
            dc_pad = jnp.zeros((n_pad,), d_col.dtype).at[: mat.n].set(
                d_col
            )
        idx = mat.starts[:, None] + jnp.arange(WB, dtype=jnp.int32)[None]
        dc_win = dc_pad[idx]  # (ngroups, WB)
        slabs = (
            mat.slabs
            * dr.reshape(ngroups, R, 1)
            * dc_win[:, None, :]
        )
        return _BandMat(slabs, mat.starts, mat.m, mat.n)

    def scale(self, d_row, d_col):
        out = BandOp(
            self._scale_mat(self.fwd, d_row, d_col),
            self._scale_mat(self.bwd, d_col, d_row),
            use_pallas=self.use_pallas,
        )
        out._nnz = getattr(self, "_nnz", None)
        return out

    def tree_flatten(self):
        return (self.fwd, self.bwd), (
            getattr(self, "_nnz", None), self.use_pallas,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        op = cls(children[0], children[1], use_pallas=aux[1])
        op._nnz = aux[0]
        return op
