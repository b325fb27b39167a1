"""Covariance functions (reference: ``linpde_gp.randprocs.covfuncs``)."""

from .base import CovarianceFunction, StationaryMixin
from .arithmetic import (
    ScaledCovarianceFunction,
    SumCovarianceFunction,
    ZeroCovarianceFunction,
)
from .bessel import kv, matern_bessel
from .stationary import ExpQuad, Matern, half_integer_matern_coefficients
from .tensor_product import TensorProduct
from .multioutput import (
    IndependentMultiOutputCovarianceFunction,
    StackCovarianceFunction,
)
from .wendland import (
    WendlandCovarianceFunction,
    WendlandFunction,
    WendlandPolynomial,
    pascal_row,
)
from .parametric import GalerkinCovarianceFunction, ParametricCovarianceFunction

# Re-export the grid type under the reference's name/location.
from ...models.domains.grid import TensorProductGrid

__all__ = [
    "CovarianceFunction",
    "StationaryMixin",
    "ScaledCovarianceFunction",
    "SumCovarianceFunction",
    "ZeroCovarianceFunction",
    "ExpQuad",
    "Matern",
    "half_integer_matern_coefficients",
    "kv",
    "matern_bessel",
    "TensorProduct",
    "TensorProductGrid",
    "IndependentMultiOutputCovarianceFunction",
    "StackCovarianceFunction",
    "WendlandCovarianceFunction",
    "WendlandFunction",
    "WendlandPolynomial",
    "pascal_row",
    "ParametricCovarianceFunction",
    "GalerkinCovarianceFunction",
]
