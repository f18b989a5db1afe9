"""Sharded-solve tests on the 8-device virtual CPU mesh (SURVEY.md §4:
simulated-multihost CI so pod-slice code paths run without TPUs)."""

import jax
import numpy as np
import pytest

from tpdlp import SolverConfig, Status, generate_feasible_lp, solve
from tpdlp.shard import make_solver_mesh
from tests.oracles import solve_oracle


def test_mesh_shapes():
    mesh = make_solver_mesh()
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"row", "col"}


@pytest.mark.parametrize("shape", [(2, 4), (1, 8), (8, 1)])
def test_sharded_solve_matches_oracle(shape):
    mesh = make_solver_mesh(shape=shape)
    # Dimensions deliberately NOT divisible by the mesh (exercise padding).
    problem = generate_feasible_lp(n=53, m_ineq=29, m_eq=10, seed=11)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
    result = solve(problem, cfg, mesh=mesh)
    oracle = solve_oracle(problem)
    assert result.status == Status.SOLVED
    assert oracle.status == 0
    np.testing.assert_allclose(result.objective, oracle.fun, rtol=1e-3, atol=1e-3)
    assert result.x.shape == (problem.n,)
    assert result.y.shape == (problem.m,)


def test_sharded_equals_unsharded():
    mesh = make_solver_mesh(shape=(2, 4))
    problem = generate_feasible_lp(n=48, m_ineq=24, m_eq=8, seed=12)
    cfg = SolverConfig(tol=1e-6, max_kkt=60_000)
    r1 = solve(problem, cfg)
    r8 = solve(problem, cfg, mesh=mesh)
    # Same algorithm, same data — padding is exact, so iterate counts and
    # objectives agree tightly.
    assert r8.status == r1.status == Status.SOLVED
    np.testing.assert_allclose(r8.objective, r1.objective, rtol=1e-6)
    assert abs(r8.iterations - r1.iterations) <= 2


def test_sharded_with_all_features():
    mesh = make_solver_mesh(shape=(2, 4))
    problem = generate_feasible_lp(n=40, m_ineq=30, m_eq=6, seed=13)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, scaling="ruiz", adaptive=True,
        primal_weight_update=True, infeasibility_detect=True,
    )
    result = solve(problem, cfg, mesh=mesh)
    oracle = solve_oracle(problem)
    assert result.status == Status.SOLVED
    np.testing.assert_allclose(result.objective, oracle.fun, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("shape", [(2, 4), (8, 1)])
def test_sharded_sparse_solve_matches_oracle(shape):
    """Block-ELL operator 1D-partitioned over the flat device axis — the
    layout for single LPs too big to densify on one chip (VERDICT round 1
    missing #2).  Dimensions non-divisible to exercise the sparse padding."""
    mesh = make_solver_mesh(shape=shape)
    problem = generate_feasible_lp(n=83, m_ineq=47, m_eq=14, seed=14)
    cfg = SolverConfig(
        tol=1e-6, max_kkt=60_000, scaling="ruiz", adaptive=True
    )
    result = solve(problem, cfg, mesh=mesh, matrix_format="sparse")
    oracle = solve_oracle(problem)
    assert result.status == Status.SOLVED
    assert oracle.status == 0
    np.testing.assert_allclose(
        result.objective, oracle.fun, rtol=1e-3, atol=1e-3
    )
    assert result.x.shape == (problem.n,)
    assert result.y.shape == (problem.m,)


def test_sharded_sparse_actually_partitions():
    """The operator tiles must be split across devices, not replicated."""
    from tpdlp.ops.blocked import BlockEllOp
    from tpdlp.shard.mesh import padded_sizes_sparse, shard_block_ell
    import scipy.sparse as sp

    mesh = make_solver_mesh(shape=(2, 4))
    m, n = padded_sizes_sparse(200, 300, mesh)
    K = sp.random(m, n, density=0.02, format="csr", random_state=0)
    op = shard_block_ell(BlockEllOp.from_scipy(K, np.float32), mesh)
    shards = op.fwd.tiles.addressable_shards
    assert len(shards) == 8
    per_dev = op.fwd.tiles.shape[0] // 8
    assert all(s.data.shape[0] == per_dev for s in shards)


def test_sharded_sparse_fp64_tail():
    """The fp64 escalation tail can run sharded+sparse (the route for
    instances over the single-chip emulated-fp64 program limit)."""
    mesh = make_solver_mesh(shape=(2, 4))
    problem = generate_feasible_lp(n=50, m_ineq=30, m_eq=8, seed=15)
    cfg = SolverConfig(tol=1e-8, max_kkt=120_000, scaling="ruiz")
    r32 = solve(problem, cfg.replace(tol=1e-6), mesh=mesh,
                matrix_format="sparse", dtype=np.float32)
    assert r32.status == Status.SOLVED
    r64 = solve(problem, cfg, mesh=mesh, matrix_format="sparse",
                dtype=np.float64, x0=r32.x, y0=r32.y)
    assert r64.status == Status.SOLVED
    assert r64.primal_res <= 1e-8 * (1 + np.linalg.norm(problem.q))
    assert r64.iterations < r32.iterations  # warm start did its job


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_escalation_fp64_tail_autoroutes_through_mesh(monkeypatch):
    """When the fp64 tail would exceed the single-chip emulated-fp64
    program limit and multiple devices exist, _solve_escalated builds a
    mesh over all of them and runs the tail sharded+sparse instead of
    warning-and-bailing (VERDICT round 1 next-round #3)."""
    import importlib

    import tpdlp.shard as shard_pkg
    solve_mod = importlib.import_module("tpdlp.solver.solve")

    problem = generate_feasible_lp(n=60, m_ineq=35, m_eq=10, seed=16)
    # Shrink the limit so this small problem "exceeds" it densely
    # (60*45=2700 elems) while its nnz/8 share fits.
    monkeypatch.setattr(solve_mod, "_F64_DENSE_ELEM_LIMIT", 2000)
    assert problem.m * problem.n > 2000

    built = []
    real_make = shard_pkg.make_solver_mesh

    def spy(*a, **k):
        mesh = real_make(*a, **k)
        built.append(mesh)
        return mesh

    monkeypatch.setattr(shard_pkg, "make_solver_mesh", spy)
    cfg = SolverConfig(tol=1e-8, max_kkt=200_000, scaling="ruiz")
    r = solve_mod._solve_escalated(problem, cfg)
    assert built, "fp64 tail did not route through a mesh"
    assert built[0].size == 8
    assert r.status == Status.SOLVED
    assert r.primal_res <= 1e-8 * (1 + np.linalg.norm(problem.q))
    oracle = solve_oracle(problem)
    np.testing.assert_allclose(r.objective, oracle.fun, rtol=1e-6, atol=1e-6)


def test_escalation_fp64_tail_bails_on_single_device(monkeypatch):
    """With one device and an over-limit problem the escalation still
    reports the fp32 result honestly (KKT_LIMIT + RuntimeWarning)."""
    import importlib

    solve_mod = importlib.import_module("tpdlp.solver.solve")
    problem = generate_feasible_lp(n=60, m_ineq=35, m_eq=10, seed=16)
    monkeypatch.setattr(solve_mod, "_F64_DENSE_ELEM_LIMIT", 100)
    dev0 = jax.devices()[0]
    monkeypatch.setattr(solve_mod.jax, "devices", lambda *a: [dev0])
    cfg = SolverConfig(tol=1e-8, max_kkt=200_000, scaling="ruiz")
    with pytest.warns(RuntimeWarning, match="skipped the fp64 tail"):
        r = solve_mod._solve_escalated(problem, cfg)
    assert r.status == Status.KKT_LIMIT


@pytest.mark.parametrize("shape", [(2, 4), (1, 8)])
def test_sharded_band_solve_matches_oracle(shape):
    """Band-slab layout over the flat mesh partition (the >HBM path for
    BANDED single LPs): padded build, take+einsum SpMV (GSPMD partitions
    it; the Pallas kernel is single-device only)."""
    from tpdlp import generate_banded_lp

    mesh = make_solver_mesh(shape=shape)
    problem = generate_banded_lp(n=700, m_ineq=350, m_eq=170,
                                 bandwidth=33, seed=9)
    cfg = SolverConfig(tol=1e-6, max_kkt=80_000, scaling="ruiz",
                       adaptive=True)
    result = solve(problem, cfg, mesh=mesh, matrix_format="band")
    oracle = solve_oracle(problem)
    assert result.status == Status.SOLVED
    assert oracle.status == 0
    np.testing.assert_allclose(result.objective, oracle.fun,
                               rtol=1e-3, atol=1e-3)


def test_sharded_band_actually_partitions():
    """The slabs really are split across all 8 devices."""
    import jax.numpy as jnp

    from tpdlp import generate_banded_lp
    from tpdlp.ops.band import BandOp
    from tpdlp.shard.mesh import padded_sizes_band, shard_band

    mesh = make_solver_mesh(shape=(2, 4))
    p = generate_banded_lp(n=1024, m_ineq=512, m_eq=256, bandwidth=33,
                           seed=2)
    import scipy.sparse as sp

    m_pad, n_pad = padded_sizes_band(p.m, p.n, mesh)
    coo = p.K.tocoo()
    coo = sp.coo_matrix((coo.data, (coo.row, coo.col)),
                        shape=(m_pad, n_pad))
    op = shard_band(BandOp.from_scipy(coo, jnp.float32), mesh)
    assert not op.use_pallas
    assert len(op.fwd.slabs.sharding.device_set) == 8
    shard_rows = {
        s.data.shape[0] for s in op.fwd.slabs.addressable_shards
    }
    assert shard_rows == {op.fwd.slabs.shape[0] // 8}


def test_sharded_band_rejects_non_bandlike():
    mesh = make_solver_mesh(shape=(2, 4))
    problem = generate_feasible_lp(n=4000, m_ineq=64, m_eq=16,
                                   density=0.05, seed=1)
    with pytest.raises(ValueError, match="band-like"):
        solve(problem, SolverConfig(), mesh=mesh, matrix_format="band")


def test_escalation_fp64_tail_prefers_band_for_banded(monkeypatch):
    """An over-limit fp64 tail on a BAND-LIKE instance routes through the
    sharded band layout (fastest stream) rather than block-ELL."""
    import importlib

    from tpdlp import generate_banded_lp
    import tpdlp.shard.mesh as mesh_mod

    solve_mod = importlib.import_module("tpdlp.solver.solve")
    problem = generate_banded_lp(n=400, m_ineq=200, m_eq=100, bandwidth=17,
                                 seed=6)
    # Dense 300*400=120k elems exceeds a shrunken limit; band stored
    # (~2*8*128*512) / 8 devices fits under it.
    monkeypatch.setattr(solve_mod, "_F64_DENSE_ELEM_LIMIT", 110_000)
    assert problem.m * problem.n > 110_000

    banded_calls = []
    real_shard_band = mesh_mod.shard_band

    def spy(op, mesh):
        banded_calls.append(op)
        return real_shard_band(op, mesh)

    monkeypatch.setattr(mesh_mod, "shard_band", spy)
    cfg = SolverConfig(tol=1e-8, max_kkt=200_000, scaling="ruiz")
    r = solve_mod._solve_escalated(problem, cfg)
    assert banded_calls, "fp64 tail did not take the band layout"
    assert r.status == Status.SOLVED
    oracle = solve_oracle(problem)
    np.testing.assert_allclose(r.objective, oracle.fun, rtol=1e-6,
                               atol=1e-6)


def test_sharded_operators_never_staged_on_one_device():
    """ADVICE r2 (medium): the sharded solve path must build layouts
    host-side (numpy leaves) and device_put them ONCE with the target
    sharding — never stage the whole operator on a single device first.
    Asserts (a) host builds return numpy leaves, (b) the solve path's
    sharded operator has the flat row-strip sharding, (c) solves match."""
    import scipy.sparse as sp

    import tpdlp.shard.mesh as mesh_mod
    from tpdlp.ops.band import BandOp
    from tpdlp.ops.blocked import BlockEllOp
    from tpdlp import generate_banded_lp

    problem = generate_feasible_lp(n=53, m_ineq=29, m_eq=10, seed=21,
                                   density=0.2)
    K = sp.csr_matrix(problem.K)
    ell = BlockEllOp.from_scipy(K, host=True)
    assert isinstance(ell.fwd.tiles, np.ndarray)
    assert isinstance(ell.bwd.col_idx, np.ndarray)
    band_problem = generate_banded_lp(n=200, m_ineq=100, m_eq=50,
                                      bandwidth=9, seed=22)
    band = BandOp.from_scipy(sp.csr_matrix(band_problem.K), host=True)
    assert isinstance(band.fwd.slabs, np.ndarray)

    # Through the solve path: the placed operator leaves carry the flat
    # strip sharding (partitioned over all 8 devices, not replicated on
    # one).
    mesh = make_solver_mesh(shape=(2, 4))
    placed = []
    real = mesh_mod.shard_block_ell

    def spy(op, mesh_):
        if not placed:
            # First call = the build-path placement (later calls come
            # from shard_device_problem re-placing already-sharded
            # leaves, which is fine).
            assert isinstance(op.fwd.tiles, np.ndarray), (
                "sparse mesh path staged the operator on a device "
                "before sharding"
            )
        out = real(op, mesh_)
        placed.append(out)
        return out

    import importlib

    solve_mod = importlib.import_module("tpdlp.solver.solve")
    monkeypatch_ctx = pytest.MonkeyPatch()
    try:
        monkeypatch_ctx.setattr(mesh_mod, "shard_block_ell", spy)
        cfg = SolverConfig(tol=1e-6, max_kkt=60_000, scaling="ruiz")
        r = solve(problem, cfg, mesh=mesh, matrix_format="sparse")
    finally:
        monkeypatch_ctx.undo()
    assert placed, "sparse mesh path did not go through shard_block_ell"
    tiles = placed[0].fwd.tiles
    assert len(tiles.sharding.device_set) == 8
    oracle = solve_oracle(problem)
    assert r.status == Status.SOLVED
    np.testing.assert_allclose(r.objective, oracle.fun, rtol=1e-3,
                               atol=1e-3)
