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


def _pad_to(v, size, fill=0.0):
    pad = size - v.shape[0]
    if pad == 0:
        return v
    return np.concatenate([np.asarray(v), np.full((pad,), fill, v.dtype)])


def padded_sizes(m: int, n: int, mesh: Mesh) -> tuple[int, int]:
    """Row/col sizes padded to mesh-divisible multiples (static shapes)."""
    r, c = mesh.shape[ROW], mesh.shape[COL]
    return (-(-m // r)) * r, (-(-n // c)) * c


def shard_device_problem(pb, mesh: Mesh):
    """Place a DeviceProblem's arrays onto the mesh.

    The problem must already have mesh-divisible dimensions (use
    tpdlp.problem padding helpers / batch utilities for arbitrary sizes).
    Padding semantics that keep the maths exact: padded K rows/cols are
    zero; padded q entries 0 with ineq_mask True (so the primal residual
    contribution is min(0-0, 0) = 0); padded bounds l=u=0 fix padded
    variables at zero.
    """
    mat_s, yvec_s, xvec_s, rep_s = problem_shardings(mesh)
    put = jax.device_put
    import dataclasses

    from tpdlp.ops.dense import DenseOp

    assert isinstance(pb.op, DenseOp), "sharding currently covers DenseOp"
    return dataclasses.replace(
        pb,
        op=DenseOp(put(pb.op.mat, mat_s)),
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
    "x_plain_sum", "x_sum", "x_restart", "kty_restart",
})
_Y_FIELDS = frozenset({
    "y", "kx", "y_prev", "kx_prev", "y_norm_prev", "y_plain_sum",
    "y_sum", "y_restart", "kx_restart",
})


def shard_state(st: PDHGState, mesh: Mesh) -> PDHGState:
    """Place a PDHGState's arrays onto the mesh (x-space on "col",
    y-space on "row", scalars replicated)."""
    import dataclasses as _dc

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


def pad_problem_arrays(K, c, q, l, u, ineq_mask, m_pad: int, n_pad: int):
    """Zero-pad problem arrays to (m_pad, n_pad) with exactness-preserving
    fills: K zero-padded; q zero; padded rows marked as inequalities (their
    residual min(0, 0) vanishes); padded variables fixed at 0 (l = u = 0)."""
    m, n = K.shape
    K_p = np.zeros((m_pad, n_pad), dtype=K.dtype)
    K_p[:m, :n] = K
    c_p = _pad_to(c, n_pad)
    q_p = _pad_to(q, m_pad)
    l_p = _pad_to(l, n_pad)
    u_p = _pad_to(u, n_pad)
    mask_p = np.concatenate(
        [np.asarray(ineq_mask), np.ones(m_pad - m, dtype=bool)]
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
