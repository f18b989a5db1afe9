"""Test configuration: force an 8-device virtual CPU mesh before JAX init.

Multi-chip sharding paths run in CI on any host via
`--xla_force_host_platform_device_count` (SURVEY.md §4's simulated-multihost
strategy); TPU access is not required for the test suite.
"""

import os

# Force, don't setdefault: the environment may pin JAX_PLATFORMS to a TPU
# plugin (e.g. axon) and may even pre-import jax from sitecustomize, so the
# env var alone is not enough — also override via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)
assert len(jax.devices()) == 8, (
    "expected 8 virtual CPU devices; XLA_FLAGS was applied too late: "
    f"{len(jax.devices())}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture(autouse=True)
def _bound_jit_cache_memory(request):
    """Clear the jit caches after memory-heavy tests.

    Each jitted config pins its compiled program plus constant buffers; a
    combined fast+slow run accumulates hundreds of them in one process
    and can exhaust host memory (observed as a segfault near the end of
    `pytest -m ""`).  Clearing after slow-marked tests (the big
    batteries) keeps the combined run bounded without slowing the
    default fast run."""
    yield
    if request.node.get_closest_marker("slow"):
        jax.clear_caches()


@pytest.fixture(autouse=True, scope="module")
def _clear_caches_per_module():
    """Clear the jit caches at every test-module boundary.

    Round 3's blocked loop made each compiled solver program several
    times bigger; with hundreds of them accumulated in one process the
    XLA:CPU compiler itself eventually segfaults mid-compile (observed
    deterministically ~230 tests in, while the same compile succeeds in
    a fresh process).  Module-boundary clears bound the accumulation;
    within a module the caches still amortize compiles across tests."""
    yield
    jax.clear_caches()
