"""MPS parser / writer tests: golden fixtures incl. RANGES and BOUNDS edge
cases (SURVEY.md §4), plus write->read round trips."""

import numpy as np
import pytest

from tpdlp import read_mps, generate_feasible_lp
from tpdlp.io.writer import write_mps
from tests.oracles import solve_oracle

TOY = """\
* comment line
NAME TOY
ROWS
 N COST
 L C1
 G C2
 E C3
COLUMNS
 X1 COST -1.0 C1 1.0
 X1 C2 1.0 C3 1.0
 X2 COST -2.0 C1 1.0
 X2 C2 -1.0 C3 2.0
RHS
 RHS C1 4.0 C2 -2.0
 RHS C3 5.0
BOUNDS
 UP BND X1 3.0
 UP BND X2 10.0
ENDATA
"""


def test_toy_parse(tmp_path):
    f = tmp_path / "toy.mps"
    f.write_text(TOY)
    p = read_mps(f)
    assert p.shape == (3, 2)
    assert p.m_ineq == 2
    np.testing.assert_allclose(p.c, [-1.0, -2.0])
    # L row negated into G x >= h; E row last.
    K = p.K.toarray()
    np.testing.assert_allclose(K, [[-1, -1], [1, -1], [1, 2]])
    np.testing.assert_allclose(p.q, [-4.0, -2.0, 5.0])
    np.testing.assert_allclose(p.l, [0.0, 0.0])
    np.testing.assert_allclose(p.u, [3.0, 10.0])


RANGED = """\
NAME RANGED
ROWS
 N OBJ
 L R1
 G R2
 E R3
COLUMNS
 X OBJ 1.0 R1 2.0 R2 1.0 R3 1.0
RHS
 RHS R1 10.0 R2 1.0 R3 3.0
RANGES
 RNG R1 4.0 R2 2.0 R3 -1.5
ENDATA
"""


def test_ranges_expand_to_row_pairs(tmp_path):
    f = tmp_path / "ranged.mps"
    f.write_text(RANGED)
    p = read_mps(f)
    # Every ranged row becomes two inequality rows; no equalities remain.
    assert p.m_ineq == 6 and p.m == 6
    K = p.K.toarray().ravel()
    # L row with rhs 10, range 4: 6 <= 2x <= 10  ->  [2x >= 6, -2x >= -10]
    np.testing.assert_allclose(K[0:2], [2.0, -2.0])
    np.testing.assert_allclose(p.q[0:2], [6.0, -10.0])
    # G row rhs 1 range 2: 1 <= x <= 3
    np.testing.assert_allclose(p.q[2:4], [1.0, -3.0])
    # E row rhs 3 range -1.5: 1.5 <= x <= 3
    np.testing.assert_allclose(p.q[4:6], [1.5, -3.0])


BOUNDS = """\
NAME BNDS
ROWS
 N OBJ
 G R1
COLUMNS
 A OBJ 1.0 R1 1.0
 B OBJ 1.0 R1 1.0
 C OBJ 1.0 R1 1.0
 D OBJ 1.0 R1 1.0
 E OBJ 1.0 R1 1.0
 F OBJ 1.0 R1 1.0
RHS
 RHS R1 1.0
BOUNDS
 LO BND A -2.0
 UP BND A 7.0
 FX BND B 3.5
 FR BND C
 MI BND D
 UP BND E -1.0
 BV BND F
ENDATA
"""


def test_bounds_types(tmp_path):
    f = tmp_path / "bnds.mps"
    f.write_text(BOUNDS)
    p = read_mps(f)
    l, u = p.l, p.u
    np.testing.assert_allclose([l[0], u[0]], [-2.0, 7.0])  # LO + UP
    np.testing.assert_allclose([l[1], u[1]], [3.5, 3.5])  # FX
    assert np.isneginf(l[2]) and np.isposinf(u[2])  # FR (fixed vs reference)
    assert np.isneginf(l[3]) and np.isposinf(u[3])  # MI
    # UP with negative value and no LO -> l becomes -inf (MPS convention).
    assert np.isneginf(l[4]) and u[4] == -1.0
    np.testing.assert_allclose([l[5], u[5]], [0.0, 1.0])  # BV relaxation


def test_fr_compat_flag(tmp_path):
    f = tmp_path / "bnds.mps"
    f.write_text(BOUNDS)
    p = read_mps(f, compat_fr_zero=True)
    # Reference quirk: FR sets lo = 0.0 (PDLP/util.py:162-164).
    assert p.l[2] == 0.0 and np.isposinf(p.u[2])


def test_default_rhs_zero(tmp_path):
    f = tmp_path / "z.mps"
    f.write_text(
        "NAME Z\nROWS\n N OBJ\n G R1\nCOLUMNS\n X OBJ 1.0 R1 1.0\nENDATA\n"
    )
    p = read_mps(f)
    np.testing.assert_allclose(p.q, [0.0])


def test_garbage_raises(tmp_path):
    f = tmp_path / "g.mps"
    f.write_text("not an mps file\n")
    with pytest.raises(ValueError, match="ROWS"):
        read_mps(f)


def test_objsense_max(tmp_path):
    f = tmp_path / "mx.mps"
    f.write_text(
        "NAME MX\nOBJSENSE\n MAX\nROWS\n N OBJ\n G R1\n"
        "COLUMNS\n X OBJ 2.0 R1 1.0\nRHS\n RHS R1 1.0\nENDATA\n"
    )
    p = read_mps(f)
    np.testing.assert_allclose(p.c, [-2.0])
    assert p.objsense == "MAX"


@pytest.mark.parametrize("seed", [0, 1])
def test_write_read_roundtrip(tmp_path, seed):
    p = generate_feasible_lp(n=15, m_ineq=8, m_eq=4, seed=seed)
    f = tmp_path / "rt.mps"
    write_mps(p, f)
    p2 = read_mps(f)
    assert p2.shape == p.shape and p2.m_ineq == p.m_ineq
    np.testing.assert_allclose(p2.K.toarray(), p.K.toarray(), rtol=1e-12)
    np.testing.assert_allclose(p2.c, p.c, rtol=1e-12)
    np.testing.assert_allclose(p2.q, p.q, rtol=1e-12)
    np.testing.assert_allclose(p2.l, p.l, rtol=1e-12)
    np.testing.assert_allclose(p2.u, p.u, rtol=1e-12)
    # Same optimum through the oracle.
    o1, o2 = solve_oracle(p), solve_oracle(p2)
    assert o1.status == o2.status == 0
    assert o1.fun == pytest.approx(o2.fun, rel=1e-9)


def test_validate_rejects_bad_bounds():
    p = generate_feasible_lp(n=10, m_ineq=5, m_eq=2, seed=9)
    p.l[0], p.u[0] = 2.0, 1.0
    with pytest.raises(ValueError, match="box bounds"):
        p.validate()


@pytest.mark.parametrize("seed", [0, 3, 8, 21])
def test_mps_write_read_roundtrip_property(seed):
    """write_mps -> read_mps reproduces the standard form exactly for
    randomly generated LPs with mixed bound kinds (property test)."""
    import scipy.sparse as sp

    from tpdlp import generate_feasible_lp, read_mps, write_mps

    rng = np.random.default_rng(seed)
    p = generate_feasible_lp(n=30, m_ineq=17, m_eq=6, seed=seed)
    # Mix in every bound flavor: free, one-sided, fixed, negative-upper.
    p.l[0], p.u[0] = -np.inf, np.inf
    p.l[1] = -np.inf
    p.u[2] = np.inf
    p.l[3] = p.u[3] = float(rng.normal())
    p.l[4], p.u[4] = -5.0, -1.0
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".mps", mode="w") as f:
        write_mps(p, f.name)
        p2 = read_mps(f.name)
    assert p2.m_ineq == p.m_ineq
    K1 = p.K.toarray() if sp.issparse(p.K) else np.asarray(p.K)
    K2 = p2.K.toarray()
    np.testing.assert_allclose(K2, K1, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(p2.c, p.c, rtol=1e-12)
    np.testing.assert_allclose(p2.q, p.q, rtol=1e-12)
    np.testing.assert_array_equal(np.isfinite(p2.l), np.isfinite(p.l))
    np.testing.assert_array_equal(np.isfinite(p2.u), np.isfinite(p.u))
    fin = np.isfinite(p.l)
    np.testing.assert_allclose(p2.l[fin], p.l[fin], rtol=1e-12)
    fin = np.isfinite(p.u)
    np.testing.assert_allclose(p2.u[fin], p.u[fin], rtol=1e-12)


def test_timer_and_profile_trace(tmp_path, capsys):
    import time as _time

    from tpdlp import Timer, profile_trace

    with Timer("unit"):
        _time.sleep(0.01)
    assert "unit" in capsys.readouterr().out

    import tpdlp

    p = tpdlp.generate_feasible_lp(n=10, m_ineq=6, m_eq=2, seed=0)
    with profile_trace(tmp_path / "trace"):
        tpdlp.solve(p, tpdlp.SolverConfig(tol=1e-4, max_kkt=200))
    files = [f for _, _, fs in __import__("os").walk(tmp_path) for f in fs]
    assert files, "profiler trace produced no files"
