"""Operator/functional application rule engine (the "compiler")."""

from .dispatch import (
    apply_operator,
    apply_operator_to_function,
    apply_operator_to_kernel,
    as_coefficients,
    compose_coefficients,
)
from .functionals import apply_functional
from .autodiff import AutodiffTransformedKernel, apply_diffop_to_function
from .product import SumOfProductsKernel, transform_product_kernel
from .univariate import UnivariateFactor, expquad_factor, matern_factor

__all__ = [
    "apply_operator",
    "apply_operator_to_function",
    "apply_operator_to_kernel",
    "as_coefficients",
    "compose_coefficients",
    "apply_functional",
    "AutodiffTransformedKernel",
    "apply_diffop_to_function",
    "SumOfProductsKernel",
    "transform_product_kernel",
    "UnivariateFactor",
    "expquad_factor",
    "matern_factor",
]
