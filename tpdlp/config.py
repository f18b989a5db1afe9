"""Solver configuration and status codes.

The reference scatters its hyper-parameters as inline constants
(beta=[0.2,0.8,0.36] at PDLP/primal_dual_hybrid_gradient.py:28,
restart_period=40 at :7, eta safety 0.9 at :22, theta_smooth=0.5 at :151,
adaptive exponents -0.3/-0.6 at PDLP/primal_dual_hybrid_gradient_step.py:102-107,
Ruiz max_iter=20/eps=1e-6 at PDLP/enhancements.py:4).  Here they live in one
frozen (hashable) dataclass so the whole configuration can be a static jit
argument.
"""

from __future__ import annotations

import dataclasses
import enum


class Status(enum.IntEnum):
    """Solver status codes (device-side int32; mapped to the reference's
    status strings at PDLP/primal_dual_hybrid_gradient.py:51,71,145,174 for
    CLI parity)."""

    RUNNING = 0
    SOLVED = 1
    KKT_LIMIT = 2
    TIME_LIMIT = 3
    DUAL_INFEASIBLE = 4
    PRIMAL_INFEASIBLE = 5
    NUMERICAL_ERROR = 6

    def describe(self) -> str:
        return _STATUS_STRINGS[self]


# Reference status strings, for CSV/report parity with PDLP/main.py:142-150.
_STATUS_STRINGS = {
    Status.RUNNING: "Running",
    Status.SOLVED: "Solved",
    Status.KKT_LIMIT: "Unsolved (KKT passes limit exceeded)",
    Status.TIME_LIMIT: "Unsolved (Time limit exceeded)",
    Status.DUAL_INFEASIBLE: "DUAL_INFEASIBLE",
    Status.PRIMAL_INFEASIBLE: "PRIMAL_INFEASIBLE",
    Status.NUMERICAL_ERROR: "Unsolved (Numerical error)",
}


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Static configuration for the restarted-PDHG solver.

    Frozen + hashable so it can be passed as a `static_argnames` jit argument;
    every distinct config compiles its own specialised loop (feature flags are
    Python-level branches, so disabled features cost nothing on device).
    """

    # Termination (PDLP/helpers.py:110-128).
    tol: float = 1e-4
    #: Use |gap| instead of signed gap in the gap criterion.  The reference
    #: uses the signed gap (helpers.py:127) so a negative gap passes
    #: trivially; |gap| is the standard PDLP criterion.
    abs_gap_termination: bool = False

    # Work / time budgets (PDLP/main.py:34-37).
    max_kkt: int = 100_000
    time_limit: float = 3600.0

    # Restart scheme (PDLP/primal_dual_hybrid_gradient.py:7,28,115-142).
    restart_period: int = 40
    beta_sufficient: float = 0.2
    beta_necessary: float = 0.8
    beta_artificial: float = 0.36

    #: Iteration scheme. "vanilla" is the reference's restarted PDHG.
    #: "halpern" is reflected PDHG with Halpern anchoring (the cuPDLP+
    #: r2HPDHG scheme): z_{t+1} = (t+1)/(t+2) (2 T(z_t) - z_t)
    #: + 1/(t+2) z_anchor, anchor reset at restarts.  The anchored iterate
    #: may leave the feasible box/cone; all candidates, certificates and
    #: termination are evaluated at the feasible PDHG output T(z_t), so
    #: soundness is unchanged — typically converges in ~2x fewer
    #: iterations.  Costs the same one SpMV pair per iteration (anchor
    #: products are carried; the combination is linear).
    step_scheme: str = "vanilla"

    # Step sizes.
    adaptive: bool = False
    #: "reference": exactly the reference's rule — take the step regardless,
    #: update eta by the Malitsky-Pock bound (its 200-trial loop returns after
    #: one trial: primal_dual_hybrid_gradient_step.py:71,113-115).
    #: "linesearch": true bounded backtracking line search (retry the step
    #: with the reduced eta until eta <= eta_bar), as in PDLP proper.
    adaptive_rule: str = "reference"
    max_backtracks: int = 20
    #: Reduction/growth exponents (step.py:102,107).
    adaptive_shrink_exponent: float = -0.3
    adaptive_grow_exponent: float = -0.6

    # Primal-weight (omega) update (PDLP/enhancements.py:73-78).
    primal_weight_update: bool = False
    theta_smooth: float = 0.5
    #: Clamp omega to [omega0/omega_clamp, omega0*omega_clamp] after each
    #: update.  Beyond-reference robustness guard: on INFEASIBLE problems
    #: the update spirals (the diverging side inflates its ratio term
    #: every restart — measured omega 1 -> 3e-7 in 9 restarts on a
    #: planted-infeasible LP, which blows the primal stepsize up ~3e5x,
    #: makes x slam the box walls, and destroys the dual ray the
    #: certificates need).  Measured on the planted 757-col pair:
    #: clamp 1e4 still misses the infeasible ray in 100k passes; 1e2
    #: certifies both sides in <8k iterations while leaving 4 decades
    #: of legitimate adaptation.  0 disables (exact reference behavior).
    omega_clamp: float = 1e2

    # Infeasibility certificates (PDLP/enhancements.py:80-161).
    infeasibility_detect: bool = False
    infeas_tol: float = 1e-4
    #: Normalized-iterate certificate family from
    #: experiments/InfeasibilityDetection3.py:339-390 (x/k or y/k converging
    #: to a nonzero point).  Opt-in diagnostic: as specified in the
    #: reference experiments it can misfire on slowly-converging feasible
    #: problems (x/k passes through the detection window while x -> x*), so
    #: it is off by default and not part of the sound certificate path.
    normalized_certificates: bool = False
    normalized_tol_conv: float = 1e-4
    normalized_tol_nonzero: float = 1e-3

    #: Two-stage precision escalation on accelerators when `solve` picks the
    #: dtype (dtype=None): iterate in fp32 down to `escalation_tol`, then
    #: warm-start an fp64 tail to the target tolerance.  fp32 stalls at its
    #: precision floor (~1e-7 relative KKT) while pure fp64 on TPU is
    #: XLA-emulated and ~50x slower per pass; the two-stage split reaches
    #: 1e-8 ~5x faster than pure fp64 (BASELINE.md).
    precision_escalation: bool = True
    escalation_tol: float = 1e-6
    #: Escalation stage policy: "auto" (when the user left the scheme at
    #: vanilla) runs the fp32 coarse stage as vanilla PDHG with adaptive
    #: stepsizes and the fp64 tail as Halpern-anchored reflected PDHG —
    #: measured fastest-or-tied at tight tolerances on every benchmark
    #: instance; "inherit" keeps the configured scheme for both stages.
    escalation_scheme: str = "auto"
    #: How the escalated stage reaches tolerances below the fp32 floor:
    #: "refine"    — iterative refinement (solver/refine.py): fp32 device
    #:               solves of zoomed correction LPs + an fp64 host outer
    #:               loop.  No fp64 on the device at all, so it is immune
    #:               to the emulated-fp64 program-size fault and runs at
    #:               full fp32/MXU speed at any problem size.
    #: "fp64_tail" — warm-started emulated-fp64 device tail (round-2
    #:               behavior; subject to the element-count guard).
    #: "auto"      — refine (measured faster and size-unlimited;
    #:               BASELINE.md round 3).
    escalation_mode: str = "auto"
    #: Target residual-reduction factor per refinement round.  Each
    #: correction solve's relative tolerance is derived from this and the
    #: correction problem's own norms (floored at fp32's ~2e-7 reach).
    refine_round_factor: float = 1e-3
    #: Per-round KKT-pass budget for the correction solves; 0 = the auto
    #: rule max(4000, 3 * stage-1 passes).  The auto rule starves hard
    #: instances when the coarse stage was cheap (a 1e-4 stage-1 on
    #: mittelmann-l takes ~1.3k passes, flooring rounds at 4k while the
    #: corrections there need tens of thousands to move the gap).
    refine_round_kkt: int = 0
    refine_max_rounds: int = 10
    #: Zoomed bounds are clipped to [-clip, +clip] in the correction LP:
    #: bounds further than clip/alpha from the incumbent cannot bind for
    #: an O(1) zoomed correction, and leaving them at alpha*(distance)
    #: inflates the box scales and wrecks the fp32 inner solve's
    #: conditioning.  Clipped-off corrections are recovered by later
    #: rounds (the outer loop re-centers every round).
    refine_clip: float = 100.0
    #: Max growth of the zoom factors per round (keeps correction data
    #: well inside fp32 range even on near-degenerate instances).
    refine_zoom: float = 1e6
    #: Active-set threshold for the correction solves: an inequality row
    #: whose zoomed dual alpha_d * y^_i exceeds this is treated as active
    #: (slack correction pinned to 0 — the row refines as a pure
    #: equality); below it the slack stays free with objective entry
    #: alpha_d * y^_i <= cap, keeping the fp32 correction objective
    #: O(cap).  Misclassified rows self-correct: the row dual remains
    #: free, so a wrongly-pinned row's dual shrinks and unpins it next
    #: round (see solver/refine.py).
    refine_dual_cap: float = 100.0
    #: Crossover-style active-set polish between refinement rounds
    #: (solver/refine.py::_active_set_polish): identify the active set
    #: from the fp64 incumbent pair, snap at-bound coordinates exactly,
    #: and solve the reduced stationarity / tight-row systems with host
    #: fp64 LSMR.  Every candidate is guarded by the honest fp64 residual
    #: measure — a misidentified active set is rejected, never folded.
    #: This is what closes the duality gap on instances where the fp32
    #: correction solves stall against the gap's representation floor
    #: (all-finite-box problems have dual residual identically 0, so the
    #: gap is the only dual error signal).
    refine_polish: bool = True

    #: PDHG-step operator products (K x / K'y inside the iteration):
    #: "exact" — the operator's exact-fp32 path (Pallas VPU kernel on TPU;
    #:           see ops/pallas_dense.py), required below ~1e-5 tolerances
    #:           where this backend's reduced-precision MXU dot stalls;
    #: "fast"  — the operator's throughput path (MXU dot on TPU).  Step
    #:           products carry ~1e-5 relative noise there, which PDHG
    #:           absorbs at loose tolerances; TERMINATION stays sound
    #:           because restart checks recompute the carried products
    #:           with the exact path before evaluating residuals (see
    #:           loop.py::_fresh_products);
    #: "auto"  — fast iff tol >= 1e-4 (the regime rounds 1-2 certified
    #:           on the MXU), exact otherwise.
    #: Off-TPU the two paths coincide (XLA CPU fp32 dots are exact).
    step_products: str = "auto"

    #: Chunk-loop structure.
    #: "blocked" — run `restart_period` iterations as one straight-line
    #:             (cond-free) block per while step, restart check at the
    #:             block boundary.  Semantically identical to "periter"
    #:             when no per-iteration certificates are configured (the
    #:             only thing that can change status mid-cycle), and much
    #:             faster on TPU: without per-iteration `lax.cond`
    #:             boundaries XLA keeps a VMEM-resident dense K across the
    #:             whole block (measured 2.8x on mittelmann-s).  The KKT
    #:             budget is checked per block, so a chunk may overrun
    #:             j_budget by up to one block (~restart_period + 5).
    #: "periter" — the round-2 loop: one iteration per while step, status
    #:             gated and restart-checked every iteration.  Required
    #:             when certificates are on (they can change status at any
    #:             iteration) — `blocked_allowed` in loop.py gates this.
    #: "auto"    — blocked whenever legal.
    loop_mode: str = "auto"

    # Initialisation (PDLP/primal_dual_hybrid_gradient.py:22-25).
    eta_safety: float = 0.9
    power_iters: int = 100
    theta: float = 1.0  # extrapolation

    # Scaling: "none" | "ruiz" | "ruiz+pc" (Ruiz then Pock-Chambolle).
    scaling: str = "none"
    ruiz_iters: int = 20
    ruiz_eps: float = 1e-6
    pock_chambolle_alpha: float = 1.0

    #: Reference computes termination norms ||q||,||c|| from the *scaled*
    #: data handed to pdlp_algorithm (primal_dual_hybrid_gradient.py:19-20)
    #: while the residuals themselves are unscaled (:157-163).  True mirrors
    #: that; False uses unscaled norms (self-consistent).
    compat_scaled_norms: bool = True

    # Host/device chunking: number of KKT passes per device dispatch before
    # the host checks wall-clock time and terminal status.  A bigger first
    # chunk costs tiny instances NOTHING (the device loop exits at a
    # terminal status regardless of the budget) but saves status-probe
    # round trips on medium solves: 500 -> 2000 measured +21% end-to-end
    # on mittelmann-s over the remote tunnel (afiro unchanged).  The cost
    # is wall-clock enforcement granularity between chunks.
    chunk_kkt_init: int = 2000
    chunk_kkt_max: int = 8000
    #: Dispatch the next chunk before the previous chunk's status probe is
    #: fetched (exact: the loop body no-ops on terminal states).  Hides the
    #: per-probe host round trip on remote TPU backends.
    host_speculation: bool = True
    #: When m + n is at most this, the per-chunk probe fetches the full
    #: result bundle (solution, objective, counters) — transfers that small
    #: are latency-dominated, so termination costs no extra round trip.
    eager_fetch_max: int = 32768

    verbose: bool = False

    def __post_init__(self):
        _check = {
            "step_scheme": ("vanilla", "halpern"),
            "adaptive_rule": ("reference", "linesearch"),
            "scaling": ("none", "ruiz", "ruiz+pc"),
            "escalation_scheme": ("auto", "inherit"),
            "escalation_mode": ("auto", "refine", "fp64_tail"),
            "step_products": ("auto", "exact", "fast"),
            "loop_mode": ("auto", "blocked", "periter"),
        }
        for field, allowed in _check.items():
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(
                    f"unknown {field}: {v!r} (expected one of {allowed})"
                )

    def replace(self, **kw) -> "SolverConfig":
        return dataclasses.replace(self, **kw)


def fast_step_products(cfg: SolverConfig) -> bool:
    """Resolve cfg.step_products: True -> steps use op.mv_fast/rmv_fast."""
    if cfg.step_products == "fast":
        return True
    if cfg.step_products == "exact":
        return False
    return cfg.tol >= 1e-4
