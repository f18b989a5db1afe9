"""Pallas TPU kernel for block-ELL SpMV.

Executes the same layout as tpdlp.ops.blocked (`_EllMat`): per strip of 8
rows, accumulate tiles[i, w] @ x_block[col_idx[i, w]] over the ELL slots.

Kernel structure:
- grid over row strips; the (W, 8, 128) tile strip of each step is DMA'd
  HBM -> VMEM by the BlockSpec pipeline (double-buffered by Pallas).
- `col_idx` rides `PrefetchScalarGridSpec` so the gather indices are in
  SMEM before the body runs.
- x lives in VMEM as (nb, 128) blocks; each slot does a dynamic-sliced
  (128,) read and a VPU multiply-reduce onto the (8,) accumulator.

SpMV is bandwidth-bound: the tile stream dominates, the VPU work
(8 x 128 fused multiply-add per tile) hides under the DMA.  For matrices
whose x vector exceeds VMEM (n > ~3M fp32) fall back to the XLA path,
which tiles the gather itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpdlp.ops.blocked import BC, BR


G = 8  # row strips per grid step (output block (G, BR) is tile-aligned)


def _kernel(idx_ref, tiles_ref, x_ref, y_ref):
    W = tiles_ref.shape[1]

    for g in range(G):  # static unroll over the strip group
        # Accumulate in full (BR, BC) lanes; the cross-lane reduction happens
        # once per strip, not once per tile — the W loop is pure VPU FMA.

        def body(w, acc):
            cb = idx_ref[g, w]
            xs = x_ref[cb, :]  # (BC,)
            t = tiles_ref[g, w]  # (BR, BC)
            return acc + t * xs[None, :]

        acc = jax.lax.fori_loop(
            0, W, body, jnp.zeros((BR, BC), tiles_ref.dtype)
        )
        y_ref[g, :] = jnp.sum(acc, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ell_matvec(tiles, col_idx, x_blk, *, interpret=False):
    mb, W, _, _ = tiles.shape
    assert mb % G == 0, mb
    vmem = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM
    # Scoped x64-off: with jax_enable_x64 on (the package default), index-map
    # literals trace as i64 while program ids are i32, and Mosaic fails to
    # legalize the mixed-type index transform ("failed to legalize
    # 'func.return'").  The kernel itself only touches i32/f32 arrays.
    with jax.enable_x64(False):
        grid_spec = pl.GridSpec(
            grid=(mb // G,),
            in_specs=[
                # Per-step (G, W) index block in SMEM — only the current
                # group's gather indices are resident, never the whole array.
                pl.BlockSpec((G, W), lambda i: (i, 0), memory_space=smem),
                # The (G, W, 8, 128) tile strip streams HBM->VMEM, double-
                # buffered by the BlockSpec pipeline.
                pl.BlockSpec(
                    (G, W, BR, BC), lambda i: (i, 0, 0, 0), memory_space=vmem
                ),
                pl.BlockSpec(memory_space=vmem),  # x blocks, fully resident
            ],
            out_specs=pl.BlockSpec(
                (G, BR), lambda i: (i, 0), memory_space=vmem
            ),
        )
        return pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mb, BR), tiles.dtype),
            interpret=interpret,
        )(col_idx, tiles, x_blk)


def ell_matvec_pallas(mat, x, *, interpret: bool | None = None):
    """y = K x over an _EllMat layout, via the Pallas kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nb = -(-mat.n // BC)
    x_pad = jnp.zeros((nb * BC,), x.dtype).at[: mat.n].set(x)
    x_blk = x_pad.reshape(nb, BC)
    y = _ell_matvec(
        mat.tiles.astype(x.dtype), mat.col_idx, x_blk, interpret=interpret
    )
    return y.reshape(-1)[: mat.m]
