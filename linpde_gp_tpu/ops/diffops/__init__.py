"""Linear function-operator DSL (reference: ``linpde_gp.linfuncops``)."""

from .coefficients import MultiIndex, PartialDerivativeCoefficients
from .linfuncop import (
    CompositeLinearFunctionOperator,
    Identity,
    LinearFunctionOperator,
    ScaledLinearFunctionOperator,
    SelectOutput,
    SumLinearFunctionOperator,
)
from .lindiffop import (
    Derivative,
    DirectionalDerivative,
    HeatOperator,
    Laplacian,
    LinearDifferentialOperator,
    PartialDerivative,
    ScaledLinearDifferentialOperator,
    SpatialLaplacian,
    TimeDerivative,
    WeightedLaplacian,
)

__all__ = [
    "MultiIndex",
    "PartialDerivativeCoefficients",
    "LinearFunctionOperator",
    "ScaledLinearFunctionOperator",
    "SumLinearFunctionOperator",
    "CompositeLinearFunctionOperator",
    "Identity",
    "SelectOutput",
    "LinearDifferentialOperator",
    "ScaledLinearDifferentialOperator",
    "PartialDerivative",
    "Derivative",
    "TimeDerivative",
    "DirectionalDerivative",
    "WeightedLaplacian",
    "Laplacian",
    "SpatialLaplacian",
    "HeatOperator",
]
