"""Tensor-product grids.

A ``TensorProductGrid`` is the dense meshgrid array of a set of 1-D factor
grids, remembering its factors.  Kernel code detects this structure and
assembles Gram matrices as Kronecker products of small 1-D factor Grams
instead of one large dense pairwise evaluation (reference:
``covfuncs/_tensor_product.py:64-82,133``).
"""

from __future__ import annotations

import numpy as np


class TensorProductGrid(np.ndarray):
    """``ndarray`` of shape ``(n_1, ..., n_d, d)`` with factor grids."""

    def __new__(cls, *factors, indexing: str = "ij"):
        factors = tuple(np.asarray(f) for f in factors)
        if not all(f.ndim == 1 for f in factors):
            raise ValueError("All grid factors must be one-dimensional.")
        mesh = np.stack(np.meshgrid(*factors, indexing=indexing), axis=-1)
        obj = mesh.view(cls)
        obj._factors = factors
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self._factors = getattr(obj, "_factors", None)

    @property
    def factors(self):
        return self._factors

    @property
    def num_factors(self) -> int:
        return len(self._factors)


def grid_factors(x) -> tuple | None:
    """Return the 1-D factor grids if ``x`` is a tensor-product grid."""
    if isinstance(x, TensorProductGrid) and x.factors is not None:
        return x.factors
    return None
