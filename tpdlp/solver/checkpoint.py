"""Checkpoint/resume of the solver state.

The reference has no checkpointing (SURVEY.md §5); its solver state is a
handful of Python locals.  Here the whole while-loop carry (iterates,
operator products, averages, step sizes, counters, status) is one pytree,
so save/restore is a flatten + npz round trip — enough to resume a long
solve after preemption (preemptible TPU pools) provided the problem and
config are rebuilt identically.

`solve(checkpoint_path=..., resume=True)` wires this in at chunk
boundaries: the state is saved after every device chunk (the host already
syncs there for the wall-clock check, so checkpointing adds only the
device->host copy).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpdlp.solver.state import PDHGState

_FIELDS = [f.name for f in dataclasses.fields(PDHGState)]


def save_state(state: PDHGState, path) -> None:
    """Write the solver carry to an .npz file.  One batched device->host
    transfer (per-field fetches cost a round trip each on remote backends)."""
    arrays = jax.device_get(
        {name: getattr(state, name) for name in _FIELDS}
    )
    arrays = {name: np.asarray(a) for name, a in arrays.items()}
    np.savez(path, **arrays)


def load_state(path, dtype=None) -> PDHGState:
    """Restore a solver carry saved by `save_state`.

    `dtype` optionally recasts the floating-point arrays (e.g. resuming an
    fp32 TPU solve on an fp64 CPU host).
    """
    z = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    # State fields added after a checkpoint was written default to zeros of
    # the matching space (x-like fields share x's shape, y-like y's).
    defaults = {
        "x_plain_sum": lambda: np.zeros_like(z["x"]),
        "y_plain_sum": lambda: np.zeros_like(z["y"]),
        "kx_plain_sum": lambda: np.zeros_like(z["y"]),
        "kty_plain_sum": lambda: np.zeros_like(z["x"]),
        "omega_init": lambda: np.asarray(z["omega"]),
        # Anchor operator products: placeholders only — solve() recomputes
        # them from the operator right after a resume (they must equal
        # K @ x_restart / K' @ y_restart for the Halpern scheme).
        "kx_restart": lambda: np.zeros_like(z["kx"]),
        "kty_restart": lambda: np.zeros_like(z["kty"]),
        "fp_res": lambda: np.zeros_like(z["eta"]),
    }
    kwargs = {}
    for name in _FIELDS:
        if name in z.files:
            a = z[name]
        elif name in defaults:
            a = defaults[name]()
        else:
            raise KeyError(
                f"checkpoint {path} lacks state field {name!r} and no "
                "default is known — re-solve from scratch"
            )
        if dtype is not None and a.dtype.kind == "f":
            a = a.astype(dtype)
        kwargs[name] = jnp.asarray(a)
    return PDHGState(**kwargs)
