"""Weak-form functionals (FEM stiffness assembly).

Parity: reference ``linfunctls/weak_forms/_laplacian.py:12`` —
``WeakForm_Laplacian_UnivariateInterpolationBasis`` applied to a trial
hat basis yields the tridiagonal stiffness matrix; applied to a general
function it is ``f ↦ [∫ φ_i Δf]_i`` (equivalently ``-∫ φ_i' f'`` for
zero-boundary test functions).
"""

from __future__ import annotations

import numpy as np

from ...models.functions.fem import UnivariateLinearInterpolationBasis
from ..diffops.lindiffop import Laplacian
from .base import CompositeLinearFunctional, LinearFunctional
from .projections import BasisIntegralFunctional


class WeakForm_Laplacian_UnivariateInterpolationBasis(CompositeLinearFunctional):
    def __init__(self, test_basis: UnivariateLinearInterpolationBasis):
        assert test_basis.zero_boundary
        self._test_basis = test_basis
        super().__init__(
            None,
            BasisIntegralFunctional(test_basis),
            Laplacian(()),
        )

    @property
    def test_basis(self) -> UnivariateLinearInterpolationBasis:
        return self._test_basis

    def stiffness_matrix(self, trial_basis: UnivariateLinearInterpolationBasis):
        """Exact P1 stiffness matrix ``A[i, j] = ∫ φ_i Δψ_j = -∫ φ_i' ψ_j'``
        for a trial basis with free boundary hats on the same interior grid
        (reference: ``weak_forms/_laplacian.py:27-51``)."""
        if trial_basis.zero_boundary:
            raise NotImplementedError("trial basis must include boundary hats")
        if not (
            len(trial_basis) == len(self._test_basis) + 2
            and np.all(trial_basis.grid[1:-1] == self._test_basis.grid)
        ):
            raise NotImplementedError("trial/test grids do not match")

        grid = trial_basis.grid
        inv_h = 1.0 / (grid[1:] - grid[:-1])
        diag = -inv_h[:-1] - inv_h[1:]
        n_test, n_trial = len(self._test_basis), len(trial_basis)
        A = np.zeros((n_test, n_trial))
        for i in range(n_test):
            A[i, i] = inv_h[i]
            A[i, i + 1] = diag[i]
            A[i, i + 2] = inv_h[i + 1]
        from ..linalg.linops import Dense

        return Dense(A)
