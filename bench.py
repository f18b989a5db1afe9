"""Headline benchmark: end-to-end restarted-PDHG solve vs the reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the mittelmann-s class instance from the benchmark suite
(5000 vars x 2000 rows, 1% density) solved end-to-end to 1e-4 relative KKT
with Ruiz scaling + adaptive stepsize + primal-weight update — the
reference's headline configuration (BASELINE.md).  Ours runs on the
available JAX device (TPU); the baseline is the reference torchPDLP
implementation executed from its read-only mount on torch CPU with the
same standard form and settings.  Iteration counts are seed-dependent on
both sides (the stepsize init is randomized), so the compared quantity is
the iteration RATE, best of 3 seeded runs per side.

value       = our PDHG iterations/s (end-to-end wall, includes scaling
              and power-iteration init)
vs_baseline = our iterations/s / reference iterations/s

The raw fused-loop kernel rate is printed to stderr as a secondary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

TOL = 1e-4
MAX_KKT = 100_000

#: Generous for a cold remote compile of the tiny probe program; a down
#: tunnel hangs forever without this.
_PROBE_TIMEOUT_S = 150


def _accelerator_responds() -> bool:
    """True iff the configured accelerator answers a tiny dispatch.

    Probed in a SUBPROCESS with a hard timeout: when the remote-tunnel
    TPU is down, jax.devices()/the first dispatch can block indefinitely
    (and not just raise), which would hang the whole benchmark run.  The
    probe itself detects CPU-only environments (the platform assert), so
    it runs regardless of JAX_PLATFORMS — a plugin registered by
    sitecustomize counts even when the env var is unset.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return False
    code = (
        "import jax\n"
        "d = jax.devices()\n"
        "assert d and d[0].platform != 'cpu', d\n"
        "jax.numpy.ones(8).sum().block_until_ready()\n"
        "print('PROBE_OK')\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=_PROBE_TIMEOUT_S,
        )
        return "PROBE_OK" in out.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    platform = "accelerator"
    if not _accelerator_responds():
        # Fall back to XLA CPU so the benchmark still produces an honest
        # (flagged) number instead of hanging; the axon plugin may already
        # be registered by sitecustomize, so force the platform in-config.
        print(
            "[bench] accelerator unresponsive — falling back to XLA CPU "
            "(result flagged platform=cpu-fallback)",
            file=sys.stderr,
        )
        platform = "cpu-fallback"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tpdlp.bench.runner import run_ours
    from tpdlp.bench.reference_runner import run_reference
    from tpdlp.bench.suite import build_suite

    problem = next(
        p for p in build_suite(("large",)) if p.name == "mittelmann-s"
    )
    # Best-of-3 measured runs, each with a DISTINCT seed: the remote-tunnel
    # TPU shows large run-to-run variance from chip/tunnel contention
    # (best-of is the contention-robust estimator), and its runtime caches
    # byte-identical dispatches — distinct seeds perturb the power-iteration
    # key so no repetition can hit that cache.  Rate, not wall time, is
    # compared (iteration counts vary with the seed on both sides).
    runs = [run_ours(problem, TOL, MAX_KKT, "float32", seed=s)
            for s in range(3)]
    ours = max(runs, key=lambda r: r["iters_per_sec"])
    for s, r in enumerate(runs):
        print(
            f"[bench] ours seed={s}: {r['time']:.3f}s k={r['iterations']} "
            f"({r['iters_per_sec']:.0f} it/s) status={r['status']}",
            file=sys.stderr,
        )
    try:
        # Symmetric protocol: best of 3 seeded runs for the reference (its
        # stepsize init draws unseeded torch.rand; run_reference seeds it).
        refs = [run_reference(problem, tol=TOL, max_kkt=MAX_KKT, seed=s)
                for s in range(3)]
        refs = [r for r in refs if r is not None]
        ref = max(refs, key=lambda r: r["iters_per_sec"]) if refs else None
        if ref:
            print(
                f"[bench] reference (torch cpu, best of 3): "
                f"{ref['time']:.3f}s "
                f"k={ref['iterations']} ({ref['iters_per_sec']:.0f} it/s)",
                file=sys.stderr,
            )
    except Exception as e:
        print(f"[bench] reference failed: {e}", file=sys.stderr)
        ref = None

    vs = (
        ours["iters_per_sec"] / ref["iters_per_sec"]
        if ref and ref["iters_per_sec"] > 0
        else None
    )
    print(json.dumps({
        "metric": "mittelmann_s_pdhg_iterations_per_sec",
        "value": round(ours["iters_per_sec"], 1),
        "unit": "iter/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "platform": platform,
    }))


if __name__ == "__main__":
    main()
