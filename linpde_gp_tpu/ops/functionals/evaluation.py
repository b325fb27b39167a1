"""Point-evaluation functionals.

Parity: reference ``linfunctls/_evaluation.py:10`` (``_EvaluationFunctional``
— output layout ``codomain_shape + X_batch_shape``, the multi-output Gram
flattening contract) and ``linfunctls/_dirac.py:10`` (``DiracFunctional``
— layout ``X_batch_shape + codomain_shape``).  The layout asymmetry is
deliberate and mirrored exactly (SURVEY.md §7 "hard parts" #1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils.shapes import as_shape
from .base import Discretization, LinearFunctional


class _EvaluationFunctional(LinearFunctional):
    def __init__(self, input_domain_shape, input_codomain_shape, X) -> None:
        input_domain_shape = as_shape(input_domain_shape)
        input_codomain_shape = as_shape(input_codomain_shape)
        self._X = np.asanyarray(X)
        batch_ndim = self._X.ndim - len(input_domain_shape)
        self._X_batch_shape = self._X.shape[:batch_ndim]
        assert self._X.shape == self._X_batch_shape + input_domain_shape
        super().__init__(
            (input_domain_shape, input_codomain_shape),
            input_codomain_shape + self._X_batch_shape,
        )

    @property
    def X(self) -> np.ndarray:
        return self._X

    @property
    def X_batch_shape(self):
        return self._X_batch_shape

    @property
    def X_batch_ndim(self) -> int:
        return len(self._X_batch_shape)

    @property
    def codomain_first(self) -> bool:
        return True

    def discretization(self) -> Discretization:
        pts = jnp.asarray(
            np.asarray(self._X).reshape((-1,) + self.input_domain_shape)
        )
        return Discretization(pts, None, codomain_first=True)

    def apply_to_function(self, f):
        vals = f(self._X)  # batch + codomain
        if self.input_codomain_shape != ():
            c_ndim = len(self.input_codomain_shape)
            vals = jnp.moveaxis(
                vals,
                tuple(range(vals.ndim - c_ndim, vals.ndim)),
                tuple(range(c_ndim)),
            )
        return vals

    def __repr__(self):
        return f"Evaluation(X~{self._X.shape})"


class DiracFunctional(LinearFunctional):
    """Same evaluations, batch-first output layout."""

    def __init__(self, input_domain_shape, input_codomain_shape, X) -> None:
        input_domain_shape = as_shape(input_domain_shape)
        input_codomain_shape = as_shape(input_codomain_shape)
        self._X = np.asanyarray(X)
        batch_ndim = self._X.ndim - len(input_domain_shape)
        self._X_batch_shape = self._X.shape[:batch_ndim]
        assert self._X.shape == self._X_batch_shape + input_domain_shape
        super().__init__(
            (input_domain_shape, input_codomain_shape),
            self._X_batch_shape + input_codomain_shape,
        )

    @property
    def X(self) -> np.ndarray:
        return self._X

    @property
    def X_batch_shape(self):
        return self._X_batch_shape

    @property
    def codomain_first(self) -> bool:
        return False

    def discretization(self) -> Discretization:
        pts = jnp.asarray(
            np.asarray(self._X).reshape((-1,) + self.input_domain_shape)
        )
        return Discretization(pts, None, codomain_first=False)

    def apply_to_function(self, f):
        return f(self._X)

    def __repr__(self):
        return f"Dirac(X~{self._X.shape})"
