"""Shared helper: build a prepared (DeviceProblem, PDHGState, cfg) triple
directly, for tests that drive run_chunk/loop internals without the
solve() orchestration."""

import jax
import jax.numpy as jnp

from tpdlp.config import SolverConfig
from tpdlp.problem import to_device_arrays
from tpdlp.solver.power_iteration import spectral_norm_estimate
from tpdlp.solver.solve import _build_device_problem
from tpdlp.solver.state import init_state


def prepared_state(problem, op_cls=None, seed=0, **cfg_kw):
    """Scale + init exactly like solve()'s preprocessing, returning the
    triple run_chunk consumes.  `op_cls` optionally re-wraps the dense
    matrix in a custom DenseOp subclass (e.g. a noisy-fast-product test
    double)."""
    cfg_kw.setdefault("scaling", "ruiz")
    cfg = SolverConfig(**cfg_kw)
    op, c, q, l, u = to_device_arrays(problem, jnp.float32)
    if op_cls is not None:
        mat = op.mat if hasattr(op, "mat") else op
        op = op_cls(jnp.asarray(mat))
    pb = _build_device_problem(op, c, q, l, u, problem.m_ineq, cfg)
    key = jax.random.PRNGKey(seed)
    eta0 = cfg.eta_safety / spectral_norm_estimate(
        pb.op, key, cfg.power_iters
    )
    c_norm = jnp.linalg.norm(pb.c)
    q_norm = jnp.linalg.norm(pb.q)
    omega0 = jnp.where(
        (q_norm > 1e-6) & (c_norm > 1e-6), c_norm / q_norm, 1.0
    )
    st = init_state(pb, eta0.astype(jnp.float32), omega0.astype(jnp.float32))
    return pb, st, cfg
