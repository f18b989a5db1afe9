"""Dense-vs-sparse operator autotune.

Reference analog: `sparse_vs_dense` (PDLP/util.py:29-74) — time the SpMV
pair in both representations on the target device and keep the faster one.
Here the timed candidates are jitted closures (so the measured cost is the
steady-state compiled kernel, not dispatch overhead), synchronised with a
device->host read.

Unlike the reference (which always holds both representations while
timing), the dense candidate is only CONSIDERED when the dense matrix fits
a memory budget — `matrix_format="auto"` must never OOM exactly the
instances the sparse path exists for.  The dense candidate is built by an
on-device COO scatter, so the dense array never materialises on the host
either.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpdlp.ops.dense import DenseOp
from tpdlp.ops.sparse import SparseOp

#: Ceiling on the dense candidate's matrix bytes.  The solver holds the
#: operator plus a scaled copy (donation collapses them) plus O(m+n)
#: vectors; 4 GiB leaves comfortable headroom on a 16 GB-HBM chip and on
#: typical hosts.  Override with TPDLP_DENSE_BYTES_BUDGET.
_DENSE_BYTES_BUDGET = int(
    os.environ.get("TPDLP_DENSE_BYTES_BUDGET", 4 << 30)
)


def _budget(budget=None) -> int:
    return _DENSE_BYTES_BUDGET if budget is None else budget


def dense_candidate_allowed(m: int, n: int, dtype, budget=None) -> bool:
    """Would a dense (m, n) matrix of `dtype` fit the autotune budget?"""
    return m * n * jnp.dtype(dtype).itemsize <= _budget(budget)


def _dense_from_coo(coo: sp.coo_matrix, dtype):
    """Dense operator via on-device scatter of the COO triplets — the dense
    array never exists in host memory (and the host->device transfer is
    12 bytes/nnz, not 4 bytes/element).  On TPU this wraps the matrix in
    the exact-fp32 Pallas operator (see problem.dense_op_for_backend)."""
    from tpdlp.problem import dense_op_for_backend

    m, n = coo.shape
    mat = (
        jnp.zeros((m, n), dtype)
        .at[jnp.asarray(coo.row), jnp.asarray(coo.col)]
        .add(jnp.asarray(coo.data, dtype))
    )
    return dense_op_for_backend(mat)


def _time_op(op, kkt_passes: int = 10) -> float:
    """Marginal seconds per SpMV pair for `op`.

    Chained SpMV pairs (each pass feeds the next, so a backend that
    caches identical dispatches cannot short-circuit the work), timed at
    TWO chain lengths: the slope cancels the fixed per-dispatch cost
    (~30 ms on remote-tunnel backends), which would otherwise drown the
    per-pass difference between candidates for small operators.
    """
    m, n = op.shape
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n,), dtype=op.dtype)
    y = jax.random.normal(ky, (m,), dtype=op.dtype)

    def chain_fn(passes):
        @jax.jit
        def chain(x, y):
            def body(_, xy):
                xv, yv = xy
                kx_ = op.mv(xv)
                kty = op.rmv(yv)
                return (
                    xv + kty / (1.0 + jnp.max(jnp.abs(kty))),
                    yv + kx_ / (1.0 + jnp.max(jnp.abs(kx_))),
                )

            return jax.lax.fori_loop(0, passes, body, (x, y))

        return chain

    lo, hi = kkt_passes, 6 * kkt_passes

    def timed(passes, dy):
        chain = chain_fn(passes)
        a, b = chain(x, y + dy)  # compile + warm (distinct dispatch)
        float(a[0]); float(b[0])
        t0 = time.perf_counter()
        a, b = chain(x, y + (dy + 1.0))  # perturbed: never byte-identical
        float(a[0]); float(b[0])  # sync
        return time.perf_counter() - t0

    t_lo = timed(lo, 0.0)
    t_hi = timed(hi, 2.0)
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def choose_operator(K, dtype=jnp.float32, kkt_passes: int = 10,
                    density_threshold: float = 0.25,
                    dense_bytes_budget=None):
    """Return (op, label): the fastest of DenseOp / SparseOp (BCOO) /
    BlockEllOp for K on the current backend.

    The dense candidate only contends when the dense matrix fits
    `dense_bytes_budget` (default TPDLP_DENSE_BYTES_BUDGET, 4 GiB);
    above that the choice is made among sparse layouts without ever
    allocating m*n elements.  Matrices denser than `density_threshold`
    skip the timing and go dense when allowed (sparse formats cannot win
    there and the timing costs extra compiles).  On TPU the sparse
    candidate is block-ELL (BCOO gathers are hostile there); on CPU, BCOO.
    """
    from tpdlp.ops.blocked import BlockEllOp, ell_stored_elems

    if sp.issparse(K):
        coo = K.tocoo()
    else:
        coo = sp.coo_matrix(np.asarray(K))
    m, n = coo.shape
    density = coo.nnz / float(m * n)
    allow_dense = dense_candidate_allowed(m, n, dtype, dense_bytes_budget)

    if allow_dense and density >= density_threshold:
        return _dense_from_coo(coo, dtype), "dense"

    candidates = []
    if allow_dense:
        candidates.append(("dense", _dense_from_coo(coo, dtype)))
    if jax.default_backend() == "tpu":
        # Band-slab first: for banded/structured K it is the only layout
        # whose stream reaches a large fraction of HBM peak (no per-tile
        # gather work).  from_scipy returns None for non-band-like K.
        from tpdlp.ops.band import BandOp

        band = BandOp.from_scipy(coo, dtype)
        if band is not None and (
            not allow_dense or band.stored_bytes() < m * n * jnp.dtype(
                dtype
            ).itemsize
        ):
            candidates.append(("band", band))
        # Estimate the block-ELL stored size BEFORE building it: the host
        # build allocates the full zero-padded float64 tile arrays, which
        # for scattered sparsity can be tens of GB.
        itemsize = jnp.dtype(dtype).itemsize
        stored_bytes = ell_stored_elems(coo) * itemsize
        if stored_bytes > _budget(dense_bytes_budget):
            if not allow_dense:
                # No dense contender either.  A band candidate that fits
                # still wins over the compact-but-gather-bound BCOO
                # fallback — BCOO is the last resort only.
                if candidates:
                    label, op = candidates[0]
                    return op, label
                return SparseOp.from_scipy(coo.tocsr(), dtype), "sparse"
        else:
            blocked = BlockEllOp.from_scipy(coo.tocsr(), dtype)
            if not allow_dense or blocked.fill_ratio() > density * 1.5:
                # Dense absent, or the padded tile stream saves bandwidth.
                candidates.append(("blocked", blocked))
    else:
        candidates.append(("sparse", SparseOp.from_scipy(coo.tocsr(), dtype)))

    if len(candidates) == 1:
        label, op = candidates[0]
        return op, label
    timed = [(_time_op(op, kkt_passes), label, op) for label, op in candidates]
    _, label, op = min(timed, key=lambda t: t[0])
    return op, label
