"""Tensor-product kernels: ``k(x0, x1) = prod_i k_i(x0_i, x1_i)``.

Parity: reference ``covfuncs/_tensor_product.py:15``.  On
``TensorProductGrid`` inputs the Gram matrix factorizes as a Kronecker
product of small 1-D factor Grams (reference ``:64-82``) — the key
structure exploited for scaling on grid-based PDE collocation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...models.domains.grid import grid_factors
from .base import CovarianceFunction


class TensorProduct(CovarianceFunction):
    r"""``k(x, y) = ∏_i k_i(x_i, y_i)`` over scalar-input factor kernels
    (reference: ``covfuncs/_tensor_product.py``); the canonical prior for
    space-time PDE problems.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> from linpde_gp_tpu.ops.kernels import Matern, TensorProduct
    >>> kt = TensorProduct(Matern((), nu=1.5), Matern((), nu=2.5))
    >>> kt.input_shape
    (2,)
    >>> round(float(kt(jnp.zeros(2), jnp.ones(2))), 6)
    0.253277
    """

    def __init__(self, *factors: CovarianceFunction):
        factors = tuple(factors)
        if not all(f.input_shape == () for f in factors):
            raise ValueError("TensorProduct factors must be scalar-input kernels.")
        if not all(
            f.output_shape_0 == () and f.output_shape_1 == () for f in factors
        ):
            raise ValueError("TensorProduct factors must be scalar-output kernels.")
        self._factors = factors
        super().__init__((len(factors),))

    @property
    def factors(self):
        return self._factors

    def _evaluate(self, x0, x1):
        out = None
        for i, k in enumerate(self._factors):
            term = k._evaluate(x0[..., i], x1[..., i])
            out = term if out is None else out * term
        return out

    def linop(self, X0, X1=None):
        from ..linalg.linops import Dense, Kronecker

        f0 = grid_factors(X0)
        f1 = grid_factors(X1) if X1 is not None else f0
        if f0 is not None and f1 is not None and len(f0) == len(self._factors):
            op = None
            for k, g0, g1 in zip(self._factors, f0, f1):
                factor_gram = Dense(k.matrix(jnp.asarray(g0), jnp.asarray(g1)))
                op = factor_gram if op is None else Kronecker(op, factor_gram)
            return op
        return super().linop(X0, X1)


class TensorProductGrid:  # re-export for API familiarity
    def __new__(cls, *factors, indexing="ij"):
        from ...models.domains.grid import TensorProductGrid as _TPG

        return _TPG(*factors, indexing=indexing)
