"""Deterministic function layer (reference: ``linpde_gp.functions``)."""

from .base import Function, LambdaFunction, Zero
from .arithmetic import ProductFunction, ScaledFunction, SumFunction, asfunction
from .basic import (
    Affine,
    Constant,
    Piecewise,
    PiecewiseConstant,
    PiecewiseLinear,
    StackedFunction,
    TruncatedGaussianMixturePDF,
    TruncatedSineSeries,
    stack,
)
from .polynomial import Monomial, Polynomial, RationalPolynomial
from .fem import UnivariateLinearInterpolationBasis
from . import bases

__all__ = [
    "Function",
    "LambdaFunction",
    "Zero",
    "SumFunction",
    "ScaledFunction",
    "ProductFunction",
    "asfunction",
    "Constant",
    "Affine",
    "Piecewise",
    "PiecewiseLinear",
    "PiecewiseConstant",
    "TruncatedSineSeries",
    "TruncatedGaussianMixturePDF",
    "StackedFunction",
    "stack",
    "Monomial",
    "Polynomial",
    "RationalPolynomial",
    "UnivariateLinearInterpolationBasis",
    "bases",
]
