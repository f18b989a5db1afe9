"""Dense-vs-sparse operator autotune.

Reference analog: `sparse_vs_dense` (PDLP/util.py:29-74) — time the SpMV
pair in both representations on the target device and keep the faster one.
Here the timed candidates are jitted closures (so the measured cost is the
steady-state compiled kernel, not dispatch overhead), synchronised with a
device->host read.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from tpdlp.ops.dense import DenseOp
from tpdlp.ops.sparse import SparseOp


def _time_op(op, kkt_passes: int = 10) -> float:
    m, n = op.shape
    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n,), dtype=op.dtype)
    y = jax.random.normal(ky, (m,), dtype=op.dtype)

    @jax.jit
    def pair(x, y):
        return op.mv(x), op.rmv(y)

    a, b = pair(x, y)  # compile + warm
    float(a[0]); float(b[0])
    t0 = time.perf_counter()
    for _ in range(kkt_passes):
        a, b = pair(x, y)
    float(a[0]); float(b[0])  # sync
    return time.perf_counter() - t0


def choose_operator(K, dtype=jnp.float32, kkt_passes: int = 10,
                    density_threshold: float = 0.25):
    """Return (op, label): the fastest of DenseOp / SparseOp (BCOO) /
    BlockEllOp for K on the current backend.

    Matrices denser than `density_threshold` skip the timing and go dense
    (sparse formats cannot win there and the timing costs extra compiles).
    On TPU the candidates are dense vs block-ELL (BCOO gathers are hostile
    there); on CPU dense vs BCOO.
    """
    from tpdlp.ops.blocked import BlockEllOp

    if sp.issparse(K):
        density = K.nnz / float(K.shape[0] * K.shape[1])
        K_sp = K.tocsr()
    else:
        K = np.asarray(K)
        density = float(np.count_nonzero(K)) / K.size
        K_sp = sp.csr_matrix(K)

    dense_op = DenseOp(jnp.asarray(
        K.toarray() if sp.issparse(K) else K, dtype
    ))
    if density >= density_threshold:
        return dense_op, "dense"

    candidates = [("dense", dense_op)]
    if jax.default_backend() == "tpu":
        blocked = BlockEllOp.from_scipy(K_sp, dtype)
        # Only contend if the padded tile stream actually saves bandwidth.
        if blocked.fill_ratio() > density * 1.5:
            candidates.append(("blocked", blocked))
    else:
        candidates.append(("sparse", SparseOp.from_scipy(K_sp, dtype)))

    timed = [(_time_op(op, kkt_passes), label, op) for label, op in candidates]
    _, label, op = min(timed, key=lambda t: t[0])
    return op, label
