"""Linear-operator representations of the constraint matrix K.

The solver is representation-agnostic: every operator exposes the SpMV pair
`mv` (K x) and `rmv` (K'y) plus batched variants.  Implementations:

- `DenseOp`   — dense (m, n) array; matmuls land on the MXU.
- `SparseCSROp` — BCSR-style block layout with Pallas SpMV kernels.
- autotuned choice between them (the reference times dense vs torch COO,
  PDLP/util.py:29-74).
"""

from tpdlp.ops.base import LinOp
from tpdlp.ops.dense import DenseOp

__all__ = ["LinOp", "DenseOp"]
