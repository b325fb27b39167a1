"""Parametric and Galerkin covariance functions.

Parity: reference ``covfuncs/_parametric.py:7`` (``φ(x0)^T Σ φ(x1)``) and
``covfuncs/_galerkin.py:10`` (the ``k ↦ P k P*`` decomposition caching
``kPa`` and ``PkP`` for FEM-projected inference).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..linalg.covariance import Covariance
from .base import CovarianceFunction


class ParametricCovarianceFunction(CovarianceFunction):
    """``k(x0, x1) = φ(x0)^T Σ φ(x1)`` for a feature/basis function φ."""

    def __init__(self, basis, cov: Covariance):
        self._basis = basis
        self._cov = cov
        if cov.shape1 != basis.output_shape:
            raise ValueError("cov.shape1 must equal basis.output_shape")
        super().__init__(basis.input_shape)

    @property
    def basis(self):
        return self._basis

    @property
    def cov(self) -> Covariance:
        return self._cov

    def _evaluate(self, x0, x1):
        phi0 = self._basis(x0)
        phi1 = self._basis(x1)
        sigma = self._cov.matrix
        return jnp.einsum("...i,ij,...j->...", phi0, sigma, phi1)


class _EmbeddedCrossCovarianceKernel(CovarianceFunction):
    """``(x0, x1) ↦ kPa(x0) · φ(x1)`` — a crosscov re-embedded as a
    kernel via the basis (reference ``_galerkin.py:55-82``)."""

    def __init__(self, pv_crosscov, basis):
        self._pv_crosscov = pv_crosscov
        self._basis = basis
        super().__init__(pv_crosscov.randproc_input_shape)

    def _evaluate(self, x0, x1):
        vals = self._pv_crosscov.evaluate(x0)  # batch0 + (m,)
        phi1 = self._basis(x1)  # batch1 + (m,)
        return jnp.sum(vals * phi1, axis=-1)


class GalerkinCovarianceFunction(CovarianceFunction):
    """Covariance of the Galerkin-projected process
    ``u_P = φ^T P[u]``-coupled decomposition: evaluates
    ``k - k P* φ - φ P k + 2 φ (P k P*) φ`` following the reference's
    algebra (``_galerkin.py:44-53``)."""

    def __init__(self, covfunc: CovarianceFunction, projection):
        from ..transforms.functionals import apply_functional
        from ..crosscov.base import apply_functional_to_crosscov

        self._covfunc = covfunc
        self._projection = projection
        self._kPa = apply_functional(projection, covfunc, argnum=1)
        self._PkPa = apply_functional_to_crosscov(projection, self._kPa)
        self._kPaP = _EmbeddedCrossCovarianceKernel(
            self._kPa, basis=projection.basis
        )
        self._PaPkPaP = ParametricCovarianceFunction(
            projection.basis, cov=self._PkPa
        )
        super().__init__(
            covfunc.input_shape,
            covfunc.output_shape_0,
            covfunc.output_shape_1,
        )

    @property
    def P(self):
        return self._projection

    @property
    def PkP(self) -> Covariance:
        return self._PkPa

    @property
    def kPa(self):
        return self._kPa

    def _evaluate(self, x0, x1):
        papkpap = self._PaPkPaP._evaluate(x0, x1)
        return (
            papkpap
            + self._covfunc._evaluate(x0, x1)
            - self._kPaP._evaluate(x0, x1)
            - self._kPaP._evaluate(x1, x0)
            + papkpap
        )
