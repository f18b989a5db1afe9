"""Wall-clock timer context manager (reference: PDLP/util.py:6-27)."""

from __future__ import annotations

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
