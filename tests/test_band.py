"""Band-slab operator (tpdlp.ops.band): layout, SpMV pair, solve path.

CPU runs exercise the portable windowed-take path and the Pallas kernel in
interpret mode; the compiled kernel is covered by the TPU roofline run
(python -m tpdlp.bench.roofline --format band).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from tpdlp import SolverConfig, Status, generate_banded_lp, solve
from tpdlp.ops.band import BandOp, _band_matvec_pallas
from tests.oracles import solve_oracle


def _banded(m, n, half, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for off in range(-half, half + 1):
        d = np.arange(max(0, -off), min(m, n - off))
        rows.append(d)
        cols.append(d + off)
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    keep = (cols >= 0) & (cols < n)
    rows, cols = rows[keep], cols[keep]
    vals = rng.standard_normal(rows.size)
    return sp.coo_matrix((vals, (rows, cols)), shape=(m, n))


@pytest.mark.parametrize(
    "m,n,half", [(500, 700, 17), (1024, 1024, 72), (300, 260, 5)]
)
def test_band_matches_scipy(m, n, half):
    rng = np.random.default_rng(3)
    K = _banded(m, n, half)
    op = BandOp.from_scipy(K, dtype=jnp.float64)
    assert op is not None
    x = rng.standard_normal(n)
    y = rng.standard_normal(m)
    np.testing.assert_allclose(
        np.asarray(op.mv(jnp.asarray(x))), K @ x, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(op.rmv(jnp.asarray(y))), K.T @ y, rtol=1e-10
    )
    X = rng.standard_normal((n, 4))
    np.testing.assert_allclose(
        np.asarray(op.mm(jnp.asarray(X))), K @ X, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(op.row_abs_norms("inf")),
        np.abs(K).max(axis=1).toarray().ravel(),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(op.col_abs_norms(2.0)),
        np.sqrt(np.asarray(K.multiply(K).sum(axis=0)).ravel()),
        rtol=1e-10,
    )


def test_band_scale_matches_scipy():
    rng = np.random.default_rng(5)
    K = _banded(400, 520, 20)
    op = BandOp.from_scipy(K, dtype=jnp.float64)
    dr = rng.uniform(0.5, 2.0, 400)
    dc = rng.uniform(0.5, 2.0, 520)
    ops = op.scale(jnp.asarray(dr), jnp.asarray(dc))
    Ks = sp.diags(dr) @ K @ sp.diags(dc)
    x = rng.standard_normal(520)
    y = rng.standard_normal(400)
    np.testing.assert_allclose(
        np.asarray(ops.mv(jnp.asarray(x))), Ks @ x, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(ops.rmv(jnp.asarray(y))), Ks.T @ y, rtol=1e-10
    )


def test_band_pallas_kernel_interpret_matches():
    K = _banded(640, 640, 30)
    op = BandOp.from_scipy(K, dtype=jnp.float32)
    x = np.random.default_rng(1).standard_normal(640).astype(np.float32)
    xw = op.fwd._windows(jnp.asarray(x))
    y = _band_matvec_pallas(op.fwd.slabs, xw, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y).ravel()[:640], K @ x, rtol=2e-4, atol=1e-4
    )


def test_band_rejects_unstructured():
    rng = np.random.default_rng(2)
    D = sp.random(300, 4000, density=0.05, random_state=rng)
    assert BandOp.from_scipy(D) is None


def test_solve_banded_end_to_end():
    p = generate_banded_lp(n=768, m_ineq=384, m_eq=192, bandwidth=33,
                           seed=4)
    o = solve_oracle(p)
    r = solve(
        p,
        SolverConfig(tol=1e-7, max_kkt=200_000, scaling="ruiz",
                     adaptive=True, abs_gap_termination=True),
        matrix_format="band",
    )
    assert r.status == Status.SOLVED
    assert abs(r.objective - o.fun) / (1 + abs(o.fun)) < 1e-5


def test_solve_band_format_rejects_unstructured():
    # Wide unstructured K: any 128-row group spans ~the full 4000 columns,
    # far past the window budget.  (Matrices with n <= the window budget
    # are trivially band-like — a single dense slab — and are accepted.)
    from tpdlp import generate_feasible_lp

    p = generate_feasible_lp(n=4000, m_ineq=100, m_eq=40, density=0.05,
                             seed=0)
    with pytest.raises(ValueError, match="band-like"):
        solve(p, SolverConfig(), matrix_format="band")


@pytest.mark.parametrize("fmt", ["dense", "band", "ell"])
def test_roofline_formats_run(fmt):
    """The roofline harness drives the full solver loop in every format
    (rates are meaningless on CPU; this guards the wiring)."""
    from tpdlp.bench.roofline import run_roofline

    r = run_roofline(256, 512, 300, fmt=fmt, bandwidth=33)
    assert r["iterations"] > 0
    assert np.isfinite(r["sec_per_iter"]) and r["sec_per_iter"] > 0
    assert r["op_mbytes"] > 0


def test_band_device_build_matches_host_build():
    """The on-device COO scatter assembles the identical slabs as the
    host numpy build (the default ships 12 bytes/nnz instead of the
    zero-padded slab array)."""
    K = _banded(520, 640, 21, seed=8)
    a = BandOp.from_scipy(K, dtype=jnp.float64, device_build=True)
    b = BandOp.from_scipy(K, dtype=jnp.float64, device_build=False)
    np.testing.assert_array_equal(np.asarray(a.fwd.starts),
                                  np.asarray(b.fwd.starts))
    np.testing.assert_allclose(np.asarray(a.fwd.slabs),
                               np.asarray(b.fwd.slabs), rtol=1e-15)
    np.testing.assert_allclose(np.asarray(a.bwd.slabs),
                               np.asarray(b.bwd.slabs), rtol=1e-15)
