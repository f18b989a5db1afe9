"""Blocked (cond-free restart-cycle) loop + fast/exact step products.

Round-3 performance work: the blocked chunk runner straight-lines
`restart_period` iterations per while step (loop.py::run_chunk_blocked_impl
— on TPU this lets XLA keep a VMEM-resident dense K, measured 2.8x), and
`cfg.step_products` routes the in-step K products through the operator's
throughput path at loose tolerances while restart checks refresh carried
products through the exact path (`loop.py::_fresh_products`) so
termination is always certified exactly.

These CPU tests pin the semantics: blocked == per-iteration trajectories
bit-for-bit, mid-cycle states re-align on entry, the refresh actually
repairs noisy carried products, and the legality predicate excludes the
per-iteration-certificate configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.config import fast_step_products
from tpdlp.ops.dense import DenseOp
from tpdlp.solver.loop import (
    blocked_allowed,
    run_chunk,
    run_chunk_blocked_impl,
    run_chunk_impl,
)


def _problem():
    return generate_feasible_lp(n=60, m_ineq=30, m_eq=12, seed=11)


@pytest.mark.parametrize(
    "kw",
    [
        dict(adaptive=True, primal_weight_update=True),
        dict(adaptive=False),
        dict(adaptive=False, step_scheme="halpern"),
        dict(adaptive=True, adaptive_rule="linesearch"),
    ],
)
def test_blocked_matches_periter_exactly(kw):
    """Same seed -> the blocked and per-iteration loops produce identical
    counters and (to fp) identical solutions: the blocked body is the
    same math, just un-fenced."""
    p = _problem()
    base = dict(tol=1e-6, scaling="ruiz", max_kkt=30_000)
    rb = solve(p, SolverConfig(**base, loop_mode="blocked", **kw), seed=3)
    rp = solve(p, SolverConfig(**base, loop_mode="periter", **kw), seed=3)
    assert rb.status == rp.status == Status.SOLVED
    assert rb.iterations == rp.iterations
    assert rb.kkt_passes == rp.kkt_passes
    assert rb.restarts == rp.restarts
    np.testing.assert_allclose(rb.x, rp.x, rtol=1e-6, atol=1e-8)
    assert rb.objective == pytest.approx(rp.objective, rel=1e-9)


def test_blocked_disallowed_with_certificates():
    """Per-iteration certificate families can flip the status mid-cycle;
    the blocked runner must refuse those configs (and solve() must still
    work through the per-iteration loop)."""
    assert not blocked_allowed(SolverConfig(infeasibility_detect=True))
    assert not blocked_allowed(SolverConfig(normalized_certificates=True))
    assert not blocked_allowed(SolverConfig(loop_mode="periter"))
    assert blocked_allowed(SolverConfig())
    p = _problem()
    r = solve(
        p,
        SolverConfig(tol=1e-6, scaling="ruiz", adaptive=True,
                     infeasibility_detect=True),
        seed=3,
    )
    assert r.status == Status.SOLVED


def test_blocked_aligns_midcycle_state(rng):
    """A state stopped mid-cycle (per-iteration chunk with a small budget)
    continues identically under the blocked runner: the alignment
    pre-loop brings t to a boundary with per-iteration semantics."""
    from tests.helpers_state import prepared_state

    pb, st, cfg = prepared_state(_problem(), tol=1e-7, adaptive=True)
    # Stop mid-cycle: 17 passes is inside the first 40-iteration cycle.
    st_mid = run_chunk_impl(st, pb, jnp.int32(17), cfg)
    assert int(st_mid.t) % cfg.restart_period != 0

    fin_b = run_chunk_blocked_impl(st_mid, pb, jnp.int32(5000), cfg)
    fin_p = run_chunk_impl(st_mid, pb, jnp.int32(5000), cfg)
    assert int(fin_b.status) == int(fin_p.status)
    assert int(fin_b.k) == int(fin_p.k)
    np.testing.assert_allclose(
        np.asarray(fin_b.x), np.asarray(fin_p.x), rtol=1e-6, atol=1e-9
    )


def test_unrolled_cycle_matches_fori_cycle(rng):
    """The TPU-side unrolled cycle (forced here on CPU) is the same math
    as the default fori cycle — counters and iterates agree exactly."""
    from tests.helpers_state import prepared_state

    pb, st, cfg = prepared_state(_problem(), tol=1e-7, adaptive=True)
    fin_u = run_chunk_blocked_impl(st, pb, jnp.int32(3000), cfg,
                                   aligned=True, unroll=True)
    fin_f = run_chunk_blocked_impl(st, pb, jnp.int32(3000), cfg,
                                   aligned=True, unroll=False)
    assert int(fin_u.k) == int(fin_f.k)
    assert int(fin_u.j) == int(fin_f.j)
    np.testing.assert_allclose(
        np.asarray(fin_u.x), np.asarray(fin_f.x), rtol=1e-6, atol=1e-8
    )


def test_run_chunk_aligned_flag_requires_boundary(rng):
    """aligned=True on an actually-aligned state gives the same result as
    aligned=False (the flag only skips the no-op pre-loop)."""
    from tests.helpers_state import prepared_state

    pb, st, cfg = prepared_state(_problem(), tol=1e-7, adaptive=True)
    fin_a = run_chunk(st, pb, jnp.int32(5000), cfg, aligned=True)
    fin_b = run_chunk(st, pb, jnp.int32(5000), cfg, aligned=False)
    assert int(fin_a.k) == int(fin_b.k)
    np.testing.assert_allclose(
        np.asarray(fin_a.x), np.asarray(fin_b.x), rtol=0, atol=0
    )


class _NoisyFastOp(DenseOp):
    """DenseOp whose fast products carry deterministic relative noise —
    a CPU stand-in for the TPU MXU's reduced-precision dot, to exercise
    the _fresh_products refresh logic off-chip."""

    NOISE = 1e-5  # the measured scale of the TPU MXU dot's relative error

    def mv_fast(self, x):
        y = self.mv(x)
        return y * (1.0 + self.NOISE)

    def rmv_fast(self, y):
        x = self.rmv(y)
        return x * (1.0 - self.NOISE)

    @property
    def has_fast_products(self) -> bool:
        return True


jax.tree_util.register_pytree_node(
    _NoisyFastOp,
    lambda op: ((op.mat,), (op.precision,)),
    lambda aux, ch: _NoisyFastOp(ch[0], aux[0]),
)


def test_fresh_products_refresh_semantics(rng):
    """_fresh_products recomputes through the exact path exactly when the
    op offers fast products AND the config runs fast steps; otherwise it
    passes the carried values through untouched (no extra SpMV)."""
    from tests.helpers_state import prepared_state
    from tpdlp.solver.loop import _fresh_products

    p = _problem()
    pb, st, _ = prepared_state(p, op_cls=_NoisyFastOp, tol=1e-4)
    bad_kx = st.kx + 1.0
    bad_kty = st.kty - 1.0
    fast_cfg = SolverConfig(tol=1e-4, step_products="fast")
    exact_cfg = SolverConfig(tol=1e-4, step_products="exact")

    kx, kty = _fresh_products(pb, fast_cfg, st.x, st.y, bad_kx, bad_kty)
    np.testing.assert_allclose(
        np.asarray(kx), np.asarray(pb.op.mv(st.x)), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(kty), np.asarray(pb.op.rmv(st.y)), rtol=0, atol=0
    )

    kx, kty = _fresh_products(pb, exact_cfg, st.x, st.y, bad_kx, bad_kty)
    np.testing.assert_allclose(np.asarray(kx), np.asarray(bad_kx),
                               rtol=0, atol=0)

    # Ops without fast products never pay the refresh, even in fast mode.
    pb2, st2, _ = prepared_state(p, tol=1e-4)
    assert not pb2.op.has_fast_products
    kx, _ = _fresh_products(pb2, fast_cfg, st2.x, st2.y, bad_kx, bad_kty)
    np.testing.assert_allclose(np.asarray(kx), np.asarray(bad_kx),
                               rtol=0, atol=0)


def test_fresh_products_certifies_despite_noisy_steps(rng):
    """With deliberately-noisy fast step products, the solve still
    terminates with TRUE residuals within tolerance: restart checks
    refresh the carried products through the exact path, so the
    certificate never trusts the noisy carry."""
    from tests.helpers_state import prepared_state

    p = _problem()
    tol = 1e-4
    cfg_kw = dict(tol=tol, adaptive=True, step_products="fast")
    pb, st, cfg = prepared_state(p, op_cls=_NoisyFastOp, **cfg_kw)
    assert fast_step_products(cfg)
    fin = run_chunk(st, pb, jnp.int32(50_000), cfg)
    assert int(fin.status) == Status.SOLVED
    # Recompute the unscaled residuals from scratch in fp64 and check the
    # claimed termination honestly.
    from tpdlp.solver.refine import _terminated, host_residuals

    import scipy.sparse as sp

    x = np.asarray(fin.x * pb.d_col, np.float64)
    y = np.asarray(fin.y * pb.d_row, np.float64)
    K = p.K if not sp.issparse(p.K) else p.K
    K64 = (K.tocsr().astype(np.float64) if sp.issparse(K)
           else np.asarray(K, np.float64))
    res = host_residuals(
        K64, np.asarray(p.c, np.float64), np.asarray(p.q, np.float64),
        np.asarray(p.l, np.float64), np.asarray(p.u, np.float64),
        p.m_ineq, x, y,
    )
    q_norm = float(np.linalg.norm(p.q))
    c_norm = float(np.linalg.norm(p.c))
    # 2x headroom: the device certified in fp32 against scaled norms.
    assert res.primal_res <= 2 * tol * (1 + q_norm)
    assert res.dual_res <= 2 * tol * (1 + c_norm)


def test_band_fast_product_routing(rng, monkeypatch):
    """BandOp's fast products: the XLA einsum path serves steps only when
    on TPU, fp32, slabs within the VMEM budget, and the exact Pallas path
    is active; everything else falls back to the exact products."""
    import scipy.sparse as sp

    from tpdlp.ops import band as band_mod
    from tpdlp.ops.band import BandOp

    n = 512
    diags = [rng.standard_normal(n), rng.standard_normal(n - 3)]
    K = sp.diags(diags, [0, 3], shape=(n, n), format="csr")
    op = BandOp.from_scipy(K, jnp.float32)
    assert op is not None
    # CPU: no fast path.
    assert not op.has_fast_products
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mv_exact = np.asarray(op.mv(x))  # before the backend patch: XLA path
    np.testing.assert_allclose(np.asarray(op.mv_fast(x)), mv_exact,
                               rtol=0, atol=0)
    # Pretend-TPU: fast path turns on within the budget... (mv itself
    # would now route to the un-lowerable Pallas kernel, so only the
    # fast path — which must pick matvec_xla — is exercised here)
    monkeypatch.setattr(band_mod.jax, "default_backend", lambda: "tpu")
    assert op.has_fast_products
    np.testing.assert_allclose(np.asarray(op.mv_fast(x)), mv_exact,
                               rtol=1e-6, atol=1e-6)
    # ...but not above the VMEM budget, with fp64, or when the exact
    # kernel is disabled (sharded operators).
    monkeypatch.setattr(BandOp, "_FAST_VMEM_BUDGET", 8)
    assert not op.has_fast_products
    monkeypatch.undo()
    monkeypatch.setattr(band_mod.jax, "default_backend", lambda: "tpu")
    import dataclasses

    op_sharded = dataclasses.replace(op, use_pallas=False)
    assert not op_sharded.has_fast_products
    op64 = BandOp.from_scipy(K, jnp.float64)
    assert not op64.has_fast_products  # fp64: no fast path


def test_step_products_config_validation():
    with pytest.raises(ValueError):
        SolverConfig(step_products="mxu")
    with pytest.raises(ValueError):
        SolverConfig(loop_mode="unrolled")
    assert fast_step_products(SolverConfig(tol=1e-4))
    assert not fast_step_products(SolverConfig(tol=1e-6))
    assert fast_step_products(SolverConfig(tol=1e-6, step_products="fast"))
    assert not fast_step_products(SolverConfig(tol=1e-3,
                                               step_products="exact"))
