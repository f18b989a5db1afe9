"""Randomized config-interaction battery.

Each feature is covered by its own tests; this battery samples JOINT
configurations (scaling x stepsize scheme x adaptive rule x termination
mode x operator format x presolve backend) on random and banded
instances and checks the solver's CLAIMS are honest:

- no exceptions for any sampled combination;
- status SOLVED implies the relative KKT criteria actually hold on the
  ORIGINAL problem (with 2x slack for the final fetch rounding) and the
  duals are KKT-consistent;
- KKT_LIMIT is an acceptable (honest) outcome — random near-parallel
  banded rows can make the Hoffman constant huge and PDHG legitimately
  crawls there (the reference algorithm would too).
"""

import numpy as np
import pytest

from tpdlp import (
    SolverConfig, Status, generate_banded_lp, generate_feasible_lp, solve,
)
from tests.oracles import dual_violation, solve_oracle


@pytest.mark.slow
def test_config_fuzz_claims_are_honest():
    rng = np.random.default_rng(1234)
    tol = 1e-6
    n_solved = 0
    for t in range(25):
        banded = rng.random() < 0.3
        if banded:
            p = generate_banded_lp(
                n=int(rng.integers(200, 600)),
                m_ineq=int(rng.integers(80, 200)),
                m_eq=int(rng.integers(40, 120)),
                bandwidth=int(rng.choice([17, 33])),
                seed=int(rng.integers(0, 1000)),
            )
        else:
            p = generate_feasible_lp(
                n=int(rng.integers(20, 120)),
                m_ineq=int(rng.integers(10, 70)),
                m_eq=int(rng.integers(3, 30)),
                density=float(rng.uniform(0.1, 0.4)),
                seed=int(rng.integers(0, 1000)),
            )
        halpern = rng.random() < 0.25
        cfg = SolverConfig(
            tol=tol,
            max_kkt=120_000,
            scaling=str(rng.choice(["none", "ruiz", "ruiz+pc"])),
            adaptive=False if halpern else bool(rng.random() < 0.7),
            adaptive_rule=str(rng.choice(["reference", "linesearch"])),
            step_scheme="halpern" if halpern else "vanilla",
            primal_weight_update=bool(rng.random() < 0.7),
            abs_gap_termination=bool(rng.random() < 0.5),
            infeasibility_detect=bool(rng.random() < 0.5),
        )
        fmt = str(rng.choice(
            ["dense", "sparse", "auto"] + (["band"] if banded else [])
        ))
        presolve = str(rng.choice(["off", "python", "cpp"]))
        desc = (f"t{t} {'band' if banded else 'rand'} m={p.m} n={p.n} "
                f"sc={cfg.scaling} hs={halpern} fmt={fmt} ps={presolve}")

        r = solve(p, cfg, matrix_format=fmt, presolve=presolve)
        assert r.status in (Status.SOLVED, Status.KKT_LIMIT), (
            desc, r.status_string,
        )
        if r.status != Status.SOLVED:
            continue
        n_solved += 1
        # The reported residuals are on the ORIGINAL problem; SOLVED
        # claims must satisfy the relative criteria (2x slack).
        q_norm = float(np.linalg.norm(p.q))
        c_norm = float(np.linalg.norm(p.c))
        assert r.primal_res <= 2 * tol * (1 + q_norm), (desc, r.primal_res)
        assert r.dual_res <= 2 * tol * (1 + c_norm), (desc, r.dual_res)
        # Recovered duals must be KKT-consistent with the primal point.
        assert dual_violation(p, r.x, r.y) < 1e-3, desc
        # At this tolerance the objective should track the oracle on
        # reasonably conditioned instances; compare through the gap-
        # implied bound rather than a fixed constant.
        o = solve_oracle(p)
        gap_bound = tol * (1 + abs(r.objective) + abs(o.fun)) * 100
        assert abs(r.objective - o.fun) <= max(1e-4, gap_bound), (
            desc, r.objective, o.fun,
        )
    # The battery must actually certify most samples, not KKT_LIMIT out.
    assert n_solved >= 20, n_solved
