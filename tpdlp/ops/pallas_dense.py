"""Exact-fp32 dense matvec: a Pallas VPU kernel and the operator over it.

Why this exists: on this TPU backend, fp32 `dot_general` lowers to
reduced-precision MXU passes (~1e-5 relative error per matvec,
~2^-16-mantissa effective) and the compiler IGNORES
`lax.Precision.HIGHEST` — measured on chip: default and HIGHEST produce
bit-identical results, and a manual bf16x3 split product is WORSE (3e-4;
the MXU accumulator is not fp32 either).  `sum(K * x, axis=1)` is no
escape: XLA's algebraic simplifier pattern-matches it straight back into
the same dot.  A ~1e-5 product floor stalls every tol<=1e-6 solve (the
1e-8 refine loop on mittelmann-s burns its whole KKT budget at a 4e-3
gap on chip while converging in 58k passes on CPU with exact-fp32
products).

The only path the compiler cannot rewrite is a hand kernel: this module
streams row slabs of K through VMEM and accumulates lane-block partial
products on the VPU in true fp32 (same pattern as ops/band.py's slab
kernel, which measures exact to 2.4e-7 on chip).  A dense matvec is
HBM-bound, so leaving the MXU costs nothing — the kernel's roofline is
the same memory stream the MXU path reads.

`ExactDenseOp` materialises K' like the band layout does (TPU hates
transposed reads; reference analog precomputes A_transpose,
/root/reference/PDLP/util.py:50,63) and pads both to the kernel's block
grid at build time so no per-call copies of the matrix exist.  It is the
single-device TPU solve-path replacement for DenseOp (problem.py /
autotune build it there); DenseOp remains the layout for vmapped fleets
(batched matvecs, no pallas-under-vmap) and GSPMD-sharded solves (XLA
partitions dots, not pallas calls).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdlp.ops.base import LinOp

BR = 8  # sublane quantum (fp32)
LANES = 128
#: Target mat-block bytes per grid step: small enough that the
#: double-buffered pipeline (2 blocks) plus x and y stay well inside
#: ~16 MB VMEM, big enough to amortise grid-step overhead.
_BLOCK_BYTES = 4 << 20


def _ceil(a, b):
    return -(-a // b)


def block_shape(m: int, n128: int) -> tuple[int, int]:
    """(BM, BN) for an (m, n128) matvec (n128 already lane-padded).

    BM is a multiple of 128 (Mosaic requires rank-1 output blocks in
    128-multiples) chosen so a (BM, BN) slab fits the block budget; BN
    covers the whole row when possible, else columns split into balanced
    128-multiple blocks so padding waste stays at a few percent."""
    bm_fit = _BLOCK_BYTES // (4 * n128) // LANES * LANES
    if bm_fit >= LANES:
        bm = min(bm_fit, _ceil(m, LANES) * LANES, 1024)
        return bm, n128
    # Column-split: BN must be a multiple of 1024 so the x lane-block
    # array's (BN//128, 128) BlockSpec is Mosaic-tileable (first dim a
    # multiple of 8) when the grid has >1 column step.
    max_bn = _BLOCK_BYTES // (4 * LANES) // 1024 * 1024
    nblocks = _ceil(n128, max_bn)
    bn = _ceil(_ceil(n128, nblocks), 1024) * 1024
    return LANES, bn


def _matvec_kernel(mat_ref, x_ref, y_ref):
    """One (BM, BN) slab: lane-block partial products on the VPU, exact
    fp32.  Column grid steps accumulate into the revisited y block.

    The output block is (BM, 1): a rank-1 output would carry XLA's
    T(1024) vector tiling, which Mosaic's 128-element blocks cannot
    match (verified on chip); the (m_pad, 1) 2D form uses the standard
    (8, 128) layout on both sides."""
    j = pl.program_id(1)
    BM, BN = mat_ref.shape
    acc = jnp.zeros((BM, LANES), mat_ref.dtype)
    for b in range(BN // LANES):
        acc = acc + (
            mat_ref[:, b * LANES:(b + 1) * LANES]
            * x_ref[b][None, :]
        )
    part = jnp.sum(acc, axis=1).reshape(BM, 1)

    @pl.when(j == 0)
    def _init():
        y_ref[:, :] = part

    @pl.when(j > 0)
    def _accum():
        y_ref[:, :] = y_ref[:, :] + part


@functools.partial(jax.jit, static_argnames=("interpret",))
def matvec_exact(mat_pad, x_pad, *, interpret=False):
    """y_pad = mat_pad @ x_pad in exact fp32 on the VPU.

    `mat_pad` must be (m_pad, n_pad) with m_pad % BM == 0 and
    n_pad % BN == 0 for the derived block shape; `x_pad` is (n_pad,).
    """
    m_pad, n_pad = mat_pad.shape
    BM, BN = block_shape(m_pad, n_pad)
    assert m_pad % BM == 0 and n_pad % BN == 0, (mat_pad.shape, BM, BN)
    return _matvec_exact_x32(mat_pad, x_pad, BM, BN, interpret)


def _matvec_exact_x32(mat_pad, x_pad, BM, BN, interpret):
    m_pad, n_pad = mat_pad.shape
    # x64 off while building the call: under jax_enable_x64 the literal
    # indices in the BlockSpec index maps trace as i64 and mix with the
    # i32 program ids, which fails Mosaic legalization (func.return
    # (i32, i64)) — same guard as ops/band.py's kernel.
    with jax.enable_x64(False):
        grid_spec = pl.GridSpec(
            grid=(m_pad // BM, n_pad // BN),
            in_specs=[
                pl.BlockSpec(
                    (BM, BN),
                    lambda i, j: (i, j),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
                # x reshaped to lane blocks (n_pad//128, 128); the j-th
                # column step gets its BN-chunk as (BN//128, 128) — a
                # tileable block (BN%1024==0 when the grid splits
                # columns, so the sublane dim is a multiple of 8).
                pl.BlockSpec(
                    (BN // LANES, LANES),
                    lambda i, j: (j, 0),
                    memory_space=pl.ANY if interpret else pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (BM, 1),
                lambda i, j: (i, 0),
                memory_space=pl.ANY if interpret else pltpu.VMEM,
            ),
        )
        y = pl.pallas_call(
            _matvec_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m_pad, 1), mat_pad.dtype),
            interpret=interpret,
        )(mat_pad, x_pad.reshape(n_pad // LANES, LANES))
        return y.reshape(m_pad)


def _pad_to_grid(mat: jax.Array) -> jax.Array:
    """Zero-pad (m, n) to the kernel's block grid (built once)."""
    m, n = mat.shape
    n128 = _ceil(n, LANES) * LANES
    bm, bn = block_shape(m, n128)
    m_pad = _ceil(m, bm) * bm
    n_pad = _ceil(n128, bn) * bn
    if (m_pad, n_pad) == (m, n):
        return mat
    return jnp.zeros((m_pad, n_pad), mat.dtype).at[:m, :n].set(mat)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ExactDenseOp(LinOp):
    """Dense K with exact-fp32 products on TPU (Pallas VPU matvec).

    Both directions are materialised zero-padded to the kernel grid; the
    logical (m, n) lives in static aux data.  Off-TPU (CPU tests,
    interpret runs) the products fall back to XLA dots, which ARE exact
    fp32 there.  fp64 falls back to XLA as well (Mosaic has no fp64
    vector path; the backend's emulated-fp64 dots are genuinely fp64).
    """

    fwd_pad: jax.Array  # (m_pad, n_pad)
    bwd_pad: jax.Array  # (n_pad2, m_pad2) = padded K'
    m: int
    n: int

    @classmethod
    def build(cls, mat: jax.Array) -> "ExactDenseOp":
        m, n = mat.shape
        return cls(_pad_to_grid(mat), _pad_to_grid(mat.T), m, n)

    @property
    def shape(self):
        return (self.m, self.n)

    @property
    def dtype(self):
        return self.fwd_pad.dtype

    @property
    def mat(self) -> jax.Array:
        """The logical (m, n) matrix (cold paths: sharding setup, IO)."""
        return self.fwd_pad[: self.m, : self.n]

    def stored_bytes(self) -> int:
        """Streamed bytes per mv+rmv pair (roofline byte model)."""
        item = jnp.dtype(self.dtype).itemsize
        return (self.fwd_pad.size + self.bwd_pad.size) * item

    def _use_kernel(self) -> bool:
        return (
            jax.default_backend() == "tpu"
            and jnp.dtype(self.dtype).itemsize <= 4
        )

    def _mv_side(self, pad_mat, v, logical_in, logical_out):
        if not self._use_kernel():
            return jnp.matmul(
                pad_mat[:logical_out, :logical_in], v,
                precision=lax.Precision.HIGHEST,
            )
        n_pad = pad_mat.shape[1]
        if logical_in != n_pad:
            v = jnp.zeros((n_pad,), v.dtype).at[:logical_in].set(v)
        return matvec_exact(pad_mat, v)[:logical_out]

    def mv(self, x):
        return self._mv_side(self.fwd_pad, x, self.n, self.m)

    def rmv(self, y):
        return self._mv_side(self.bwd_pad, y, self.m, self.n)

    # Throughput step products (cfg.step_products="fast"/"auto" at loose
    # tolerances): plain MXU dots on the padded fwd matrix.  ~1e-5
    # relative noise on this backend (the compiler ignores precision
    # flags), which PDHG absorbs at tol >= 1e-4; termination stays sound
    # because restart checks refresh the carried products via the exact
    # mv/rmv before certifying (loop.py::_fresh_products).  Both
    # directions use fwd_pad ONLY (the transpose folds into the dot's
    # dimension numbers): in the blocked loop XLA then keeps the ONE
    # matrix VMEM-resident across the whole restart cycle — measured
    # 2.8x end-to-end on mittelmann-s vs the streamed exact kernel.
    def mv_fast(self, x):
        if not self._use_kernel():
            return self.mv(x)
        n_pad = self.fwd_pad.shape[1]
        if self.n != n_pad:
            x = jnp.zeros((n_pad,), x.dtype).at[: self.n].set(x)
        return jnp.matmul(self.fwd_pad, x)[: self.m]

    def rmv_fast(self, y):
        if not self._use_kernel():
            return self.rmv(y)
        m_pad = self.fwd_pad.shape[0]
        if self.m != m_pad:
            y = jnp.zeros((m_pad,), y.dtype).at[: self.m].set(y)
        return jnp.matmul(y, self.fwd_pad)[: self.n]

    @property
    def has_fast_products(self) -> bool:
        return self._use_kernel()

    # Batched products (fishnet warm start, restart-metric batches are
    # mv-only) go to the MXU: they are throughput workloads that tolerate
    # the reduced-precision dot.
    def mm(self, X):
        return jnp.matmul(self.fwd_pad[: self.m, : self.n], X)

    def rmm(self, Y):
        return jnp.matmul(Y.T, self.fwd_pad[: self.m, : self.n]).T

    def row_abs_norms(self, ord):
        a = jnp.abs(self.fwd_pad)
        if ord == "inf":
            return jnp.max(a, axis=1)[: self.m]
        return (jnp.sum(a**ord, axis=1) ** (1.0 / ord))[: self.m]

    def col_abs_norms(self, ord):
        a = jnp.abs(self.bwd_pad)
        if ord == "inf":
            return jnp.max(a, axis=1)[: self.n]
        return (jnp.sum(a**ord, axis=1) ** (1.0 / ord))[: self.n]

    def _pad_vec(self, d, size):
        if d.shape[0] == size:
            return d
        return jnp.zeros((size,), d.dtype).at[: d.shape[0]].set(d)

    def scale(self, d_row, d_col):
        dr_f = self._pad_vec(d_row, self.fwd_pad.shape[0])
        dc_f = self._pad_vec(d_col, self.fwd_pad.shape[1])
        dr_b = self._pad_vec(d_col, self.bwd_pad.shape[0])
        dc_b = self._pad_vec(d_row, self.bwd_pad.shape[1])
        return ExactDenseOp(
            self.fwd_pad * dr_f[:, None] * dc_f[None, :],
            self.bwd_pad * dr_b[:, None] * dc_b[None, :],
            self.m,
            self.n,
        )

    def astype(self, dtype):
        return ExactDenseOp(
            self.fwd_pad.astype(dtype), self.bwd_pad.astype(dtype),
            self.m, self.n,
        )

    def tree_flatten(self):
        return (self.fwd_pad, self.bwd_pad), (self.m, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)
