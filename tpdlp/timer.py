"""Wall-clock timer context manager (reference: PDLP/util.py:6-27)."""

from __future__ import annotations

import contextlib as _contextlib
import time


class Timer:
    """with Timer("label"): ...  -> prints elapsed seconds on exit.

    Use `Timer("x", quiet=True)` to just record `.elapsed`.  Note that JAX
    dispatch is asynchronous: wrap timed regions with
    `jax.block_until_ready(...)` for honest device timings.
    """

    def __init__(self, label: str = "Elapsed time", quiet: bool = False):
        self.label = label
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        if not self.quiet:
            print(f"{self.label}: {self.elapsed:.6f} seconds")
        return False


@_contextlib.contextmanager
def profile_trace(log_dir):
    """Capture a jax.profiler trace of the enclosed region.

    The reference's only instrument is the wall-clock Timer plus the
    KKT-pass ledger (SURVEY.md section 5); on TPU the real profiling tool is
    an XLA trace.  View with TensorBoard/XProf:

        with tpdlp.profile_trace("/tmp/tpdlp-trace"):
            tpdlp.solve(problem, cfg)
    """
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
