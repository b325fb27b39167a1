"""Weight-space ("parametric") Gaussian processes: ``u(x) = φ(x)^T w``
with Gaussian weights.

Parity: reference ``randprocs/_gaussian_process/_parametric.py:8``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.kernels.base import CovarianceFunction
from .functions.base import Function
from .gp import GaussianProcess
from .randvars import Normal


class _ParametricMean(Function):
    def __init__(self, weights: Normal, feature_fn: Function):
        self._weights = weights
        self._feature_fn = feature_fn
        super().__init__(feature_fn.input_shape, ())

    def _evaluate(self, x):
        phi = self._feature_fn._evaluate(x)
        if self._feature_fn.output_shape == ():
            return phi * self._weights.mean
        return phi @ self._weights.mean


class _ParametricCov(CovarianceFunction):
    def __init__(self, weights: Normal, feature_fn: Function):
        self._weights = weights
        self._feature_fn = feature_fn
        super().__init__(feature_fn.input_shape)

    def _evaluate(self, x0, x1):
        scalar = self._feature_fn.output_shape == ()
        phi0 = self._feature_fn._evaluate(x0)
        phi1 = self._feature_fn._evaluate(x1)
        if scalar:
            return phi0 * float(jnp.squeeze(self._weights.cov.matrix)) * phi1
        sigma = self._weights.cov.matrix
        return jnp.einsum("...i,ij,...j->...", phi0, sigma, phi1)


class ParametricGaussianProcess(GaussianProcess):
    def __init__(self, weights: Normal, feature_fn: Function, mean=None):
        self._weights = weights
        self._feature_fn = feature_fn
        if mean is None:
            mean = _ParametricMean(weights, feature_fn)
        super().__init__(
            mean=mean, cov=_ParametricCov(weights, feature_fn)
        )

    @property
    def weights(self) -> Normal:
        return self._weights

    @property
    def feature_fn(self) -> Function:
        return self._feature_fn
