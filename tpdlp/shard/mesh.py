"""Multi-chip sharding of the PDHG solve over a 2D device mesh.

The reference is strictly single-device (SURVEY.md §2.3: no
torch.distributed / NCCL anywhere); this module is the TPU-native scale-out
design: the constraint matrix K is 2D block-partitioned over a
("row", "col") mesh, y-space vectors ride the "row" axis and x-space
vectors the "col" axis.  With those placements the per-iteration SpMV pair
lowers to local matmuls plus exactly one collective each:

    K x   : local (m/R, n/C) @ (n/C) blocks -> psum over "col" -> y on "row"
    K'y   : local blocks                    -> psum over "row" -> x on "col"

Scalar reductions (norms, duality gap, termination flags) become psums over
both axes.  All of this is *induced* by GSPMD from the array placements —
the solver body (tpdlp.solver.loop) is unchanged; XLA inserts the
collectives (ICI within a slice, DCN across hosts).  That is the
"pick a mesh, annotate shardings, let the compiler do the rest" recipe, and
it keeps one code path for 1 chip and N chips.

Multi-host entry: call `jax.distributed.initialize()` before building the
mesh; `jax.devices()` then spans the pod slice and the same placements
apply (DCN-aware meshes via jax.make_mesh's device ordering).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpdlp.solver.state import PDHGState

ROW, COL = "row", "col"


def make_solver_mesh(devices=None, shape=None) -> Mesh:
    """Build a 2D ("row", "col") mesh over the given devices.

    Default shape: as square as possible (balances the two collectives).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        r = int(math.sqrt(n))
        while n % r:
            r -= 1
        shape = (r, n // r)
    assert shape[0] * shape[1] == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (ROW, COL))


def problem_shardings(mesh: Mesh):
    """NamedShardings for (matrix, y-space vector, x-space vector, scalar)."""
    mat = NamedSharding(mesh, P(ROW, COL))
    yvec = NamedSharding(mesh, P(ROW))
    xvec = NamedSharding(mesh, P(COL))
    rep = NamedSharding(mesh, P())
    return mat, yvec, xvec, rep


def flat_shardings(mesh: Mesh):
    """Shardings for the SPARSE (block-ELL) layout: both mesh axes are
    flattened into ONE partition axis, so each of K and K' is 1D
    row-strip-partitioned across ALL devices (memory nnz/N per device per
    matrix, vs nnz/R + nnz/C for a 2D split).  Vectors in both spaces ride
    the same flat axis.  Per iteration GSPMD then inserts exactly one
    collective per SpMV: all-gather of the gathered-side vector; the
    output strips are already local.
    """
    strip = NamedSharding(mesh, P((ROW, COL)))  # tiles axis 0 / col_idx
    vec = NamedSharding(mesh, P((ROW, COL)))
    rep = NamedSharding(mesh, P())
    return strip, vec, rep


def _pad_to(v, size, fill=0.0):
    pad = size - v.shape[0]
    if pad == 0:
        return v
    return np.concatenate([np.asarray(v), np.full((pad,), fill, v.dtype)])


def padded_sizes(m: int, n: int, mesh: Mesh) -> tuple[int, int]:
    """Row/col sizes padded to mesh-divisible multiples (static shapes)."""
    r, c = mesh.shape[ROW], mesh.shape[COL]
    return (-(-m // r)) * r, (-(-n // c)) * c


def padded_sizes_sparse(m: int, n: int, mesh: Mesh) -> tuple[int, int]:
    """Padded sizes for the sharded block-ELL layout.

    Both dimensions pad to a multiple of L = lcm(128, 8 * lcm(8, N)) so
    that (a) the 8-row strip count of K and of K' is divisible by the flat
    device count N *and* by 8 (the Pallas sublane constraint baked into
    _build_ell), and (b) each dimension is a whole number of 128-lane
    column blocks — every reshape in the SpMV then preserves the sharding
    and every trailing slice is an identity.
    """
    N = mesh.shape[ROW] * mesh.shape[COL]
    L = math.lcm(128, 8 * math.lcm(8, N))
    return (-(-m // L)) * L, (-(-n // L)) * L


def padded_sizes_band(m: int, n: int, mesh: Mesh) -> tuple[int, int]:
    """Padded sizes for the sharded band-slab layout: multiples of
    128 * lcm(8, N) so each direction's 128-row group count divides the
    flat device count (and the GB=8 grid grouping), and every dimension
    is whole 128-lane blocks (scatter-free x padding)."""
    N = mesh.shape[ROW] * mesh.shape[COL]
    L = 128 * math.lcm(8, N)
    return (-(-m // L)) * L, (-(-n // L)) * L


def shard_band(op, mesh: Mesh):
    """Place a BandOp on the mesh: slabs and window starts of K and K'
    are 1D-partitioned along the group axis over ALL devices (flat), and
    the Pallas kernel is swapped for the GSPMD-partitionable take+einsum
    path (custom kernels do not auto-partition)."""
    import dataclasses

    from tpdlp.ops.band import BandOp

    strip_s, _, _ = flat_shardings(mesh)
    put = jax.device_put

    def place(mat):
        return dataclasses.replace(
            mat,
            slabs=put(mat.slabs, strip_s),
            starts=put(mat.starts, strip_s),
        )

    out = BandOp(place(op.fwd), place(op.bwd), use_pallas=False)
    out._nnz = getattr(op, "_nnz", None)
    return out


def shard_block_ell(op, mesh: Mesh):
    """Place a BlockEllOp on the mesh: K's and K''s tile arrays are
    1D-partitioned along the row-strip axis over ALL devices (the mesh
    axes flattened)."""
    import dataclasses

    strip_s, _, _ = flat_shardings(mesh)
    put = jax.device_put

    def place(mat):
        return dataclasses.replace(
            mat,
            tiles=put(mat.tiles, strip_s),
            col_idx=put(mat.col_idx, strip_s),
        )

    out = dataclasses.replace(op, fwd=place(op.fwd), bwd=place(op.bwd))
    out._nnz = getattr(op, "_nnz", None)
    return out


def shard_device_problem(pb, mesh: Mesh):
    """Place a DeviceProblem's arrays onto the mesh.

    The problem must already have mesh-divisible dimensions (use
    tpdlp.problem padding helpers / batch utilities for arbitrary sizes).
    Padding semantics that keep the maths exact: padded K rows/cols are
    zero; padded q entries 0 with ineq_mask True (so the primal residual
    contribution is min(0-0, 0) = 0); padded bounds l=u=0 fix padded
    variables at zero.
    """
    import dataclasses

    from tpdlp.ops.band import BandOp
    from tpdlp.ops.blocked import BlockEllOp
    from tpdlp.ops.dense import DenseOp

    put = jax.device_put
    if isinstance(pb.op, (BlockEllOp, BandOp)):
        # Sparse layouts: flat 1D partition for the operator AND both
        # vector spaces (see flat_shardings).
        _, vec_s, rep_s = flat_shardings(mesh)
        yvec_s = xvec_s = vec_s
        if isinstance(pb.op, BandOp):
            op_sharded = shard_band(pb.op, mesh)
        else:
            op_sharded = shard_block_ell(pb.op, mesh)
    else:
        assert isinstance(pb.op, DenseOp), (
            f"sharding covers DenseOp, BlockEllOp and BandOp, "
            f"got {type(pb.op)}"
        )
        mat_s, yvec_s, xvec_s, rep_s = problem_shardings(mesh)
        op_sharded = DenseOp(put(pb.op.mat, mat_s))
    return dataclasses.replace(
        pb,
        op=op_sharded,
        c=put(pb.c, xvec_s),
        q=put(pb.q, yvec_s),
        l=put(pb.l, xvec_s),
        u=put(pb.u, xvec_s),
        ineq_mask=put(pb.ineq_mask, yvec_s),
        is_neg_inf=put(pb.is_neg_inf, xvec_s),
        is_pos_inf=put(pb.is_pos_inf, xvec_s),
        l_dual=put(pb.l_dual, xvec_s),
        u_dual=put(pb.u_dual, xvec_s),
        d_row=put(pb.d_row, yvec_s),
        d_col=put(pb.d_col, xvec_s),
        c0=put(pb.c0, xvec_s),
        q0=put(pb.q0, yvec_s),
        l0_dual=put(pb.l0_dual, xvec_s),
        u0_dual=put(pb.u0_dual, xvec_s),
        q_norm_term=put(pb.q_norm_term, rep_s),
        c_norm_term=put(pb.c_norm_term, rep_s),
    )


# Carry fields living in x-space (length n, sharded on "col") and y-space
# (length m, sharded on "row"); everything else is a replicated scalar.
# Field-name driven so new PDHGState fields cannot be silently missed —
# an unknown vector field falls back to replicated (correct, just slower).
_X_FIELDS = frozenset({
    "x", "kty", "x_prev", "kty_prev", "lam_prev", "x_norm_prev",
    "x_plain_sum", "kty_plain_sum", "x_sum", "x_restart", "kty_restart",
})
_Y_FIELDS = frozenset({
    "y", "kx", "y_prev", "kx_prev", "y_norm_prev", "y_plain_sum", "kx_plain_sum",
    "y_sum", "y_restart", "kx_restart",
})


def shard_state(st: PDHGState, mesh: Mesh, layout: str = "2d") -> PDHGState:
    """Place a PDHGState's arrays onto the mesh (layout "2d": x-space on
    "col", y-space on "row"; layout "flat": both spaces on the flattened
    device axis, matching the sharded block-ELL operator), scalars
    replicated."""
    import dataclasses as _dc

    if layout == "flat":
        _, vec_s, rep_s = flat_shardings(mesh)
        yvec_s = xvec_s = vec_s
    else:
        _, yvec_s, xvec_s, rep_s = problem_shardings(mesh)
    kwargs = {}
    for f in _dc.fields(st):
        v = getattr(st, f.name)
        if f.name in _X_FIELDS:
            s = xvec_s
        elif f.name in _Y_FIELDS:
            s = yvec_s
        else:
            s = rep_s
        kwargs[f.name] = jax.device_put(v, s)
    return PDHGState(**kwargs)


def pad_vectors(c, q, l, u, ineq_mask, m_pad: int, n_pad: int):
    """Exactness-preserving zero-padding of the problem vectors: q zero;
    padded rows marked as inequalities (their residual min(0, 0) vanishes);
    padded variables fixed at 0 (l = u = 0)."""
    c_p = _pad_to(c, n_pad)
    q_p = _pad_to(q, m_pad)
    l_p = _pad_to(l, n_pad)
    u_p = _pad_to(u, n_pad)
    mask_p = np.concatenate(
        [np.asarray(ineq_mask), np.ones(m_pad - len(q), dtype=bool)]
    )
    return c_p, q_p, l_p, u_p, mask_p


def pad_problem_arrays(K, c, q, l, u, ineq_mask, m_pad: int, n_pad: int):
    """pad_vectors plus the zero-padded dense K."""
    m, n = K.shape
    K_p = np.zeros((m_pad, n_pad), dtype=K.dtype)
    K_p[:m, :n] = K
    c_p, q_p, l_p, u_p, mask_p = pad_vectors(
        c, q, l, u, ineq_mask, m_pad, n_pad
    )
    return K_p, c_p, q_p, l_p, u_p, mask_p


def init_distributed(**kwargs) -> Mesh:
    """Multi-host entry: initialise the JAX distributed runtime and return
    a solver mesh spanning the whole pod slice.

    Call once per host process before any JAX computation (kwargs pass
    through to `jax.distributed.initialize`: coordinator_address,
    num_processes, process_id — all auto-detected on Cloud TPU).  After
    this, `jax.devices()` spans every chip in the slice and the returned
    ("row", "col") mesh shards a single solve across hosts; GSPMD routes
    the collectives over ICI within a slice and DCN across hosts.
    """
    jax.distributed.initialize(**kwargs)
    return make_solver_mesh()
