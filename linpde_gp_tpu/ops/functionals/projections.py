"""L2 projection onto the univariate FEM hat basis.

Parity: reference ``linfunctls/projections/l2/_fem.py:14`` — projection
coefficients ``M^{-1} b`` with the exact tridiagonal mass matrix ``M``
(``:37-57``) and ``b_i = ∫ f φ_i`` (adaptive quad in the reference; fixed
per-element Gauss-Legendre here, exact for the piecewise-smooth
integrands involved).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ...config import config
from ...models.functions.fem import UnivariateLinearInterpolationBasis
from .base import Discretization, LinearFunctional
from .integrals import _gauss_legendre


class BasisIntegralFunctional(LinearFunctional):
    """``f ↦ [∫ f(x) φ_i(x) dx]_i`` — the un-normalized load vector."""

    def __init__(self, basis: UnivariateLinearInterpolationBasis):
        self._basis = basis
        super().__init__(((), ()), basis.output_shape)

    @property
    def basis(self) -> UnivariateLinearInterpolationBasis:
        return self._basis

    @functools.cached_property
    def _disc(self) -> Discretization:
        # Per-interval Gauss-Legendre over the basis grid; the integrand
        # f * φ_i is polynomial-times-smooth on each cell.
        grid = self._basis.grid
        if not self._basis.zero_boundary:
            grid = grid[1:-1]  # sentinels carry no support
        order = max(config.quadrature_order // 8, 8)
        gl_nodes, gl_weights = _gauss_legendre(order)
        nodes = []
        weights = []
        for lo, hi in zip(grid[:-1], grid[1:]):
            mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
            nodes.append(mid + half * gl_nodes)
            weights.append(half * gl_weights)
        nodes = np.concatenate(nodes)
        weights = np.concatenate(weights)
        phi = np.asarray(self._basis(jnp.asarray(nodes)))  # (nq, n_basis)
        W = (phi * weights[:, None]).T  # (n_basis, nq)
        return Discretization(jnp.asarray(nodes), jnp.asarray(W))

    def discretization(self) -> Discretization:
        return self._disc


def fem_mass_matrix(basis: UnivariateLinearInterpolationBasis) -> np.ndarray:
    """Exact tridiagonal P1 mass matrix (reference closed form,
    ``l2/_fem.py:44-56``)."""
    x_im1, x_i, x_ip1 = basis.x_im1, basis.x_i, basis.x_ip1
    diag = (x_ip1 - x_im1) / 3.0
    offdiag = (x_ip1[:-1] - x_i[:-1]) / 6.0
    if not basis.zero_boundary:
        diag = diag.copy()
        diag[0] = (x_ip1[0] - x_i[0]) / 3.0
        diag[-1] = (x_i[-1] - x_im1[-1]) / 3.0
    M = np.diag(diag)
    M += np.diag(offdiag, 1)
    M += np.diag(offdiag, -1)
    return M


class L2Projection_UnivariateLinearInterpolationBasis(LinearFunctional):
    """``f ↦ M^{-1} [∫ f φ_i]_i`` (or the raw load vector when
    ``normalized=False``)."""

    def __init__(
        self,
        basis: UnivariateLinearInterpolationBasis,
        *,
        normalized: bool = True,
    ):
        self._basis = basis
        self._normalized = bool(normalized)
        self._integral = BasisIntegralFunctional(basis)
        super().__init__(((), ()), basis.output_shape)

    @property
    def basis(self) -> UnivariateLinearInterpolationBasis:
        return self._basis

    @property
    def normalized(self) -> bool:
        return self._normalized

    @functools.cached_property
    def normalizer(self) -> np.ndarray:
        if not self._normalized:
            return np.eye(len(self._basis))
        return np.linalg.inv(fem_mass_matrix(self._basis))

    @functools.cached_property
    def _disc(self) -> Discretization:
        inner = self._integral.discretization()
        return Discretization(
            inner.points, jnp.asarray(self.normalizer) @ inner.weights
        )

    def discretization(self) -> Discretization:
        return self._disc

    def apply_to_function(self, f):
        disc = self._disc
        return (disc.weights @ f(disc.points)).reshape(self.output_shape)
