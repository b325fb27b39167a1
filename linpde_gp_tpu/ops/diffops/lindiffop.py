"""Linear differential operators.

Parity: reference ``linfuncops/diffops/`` — ``LinearDifferentialOperator``
(``_lindiffop.py:24``), ``PartialDerivative``/``TimeDerivative``
(``_partial_derivative.py:17,131``), ``Derivative`` (``_derivative.py:11``),
``DirectionalDerivative`` (``_directional_derivative.py:15``),
``WeightedLaplacian``/``Laplacian``/``SpatialLaplacian`` (``_laplacian.py:
22,77,102``), ``HeatOperator`` (``_heat.py:14``), scaled diffops
(``diffops/_arithmetic.py:10``).

Every operator is canonically a coefficient table (``coefficients.py``);
the kernel/function transformation rules consume only that table, so new
operators compose for free.
"""

from __future__ import annotations

import numpy as np

from ...utils.shapes import as_shape
from .coefficients import MultiIndex, PartialDerivativeCoefficients
from .linfuncop import LinearFunctionOperator, ScaledLinearFunctionOperator, SumLinearFunctionOperator


class LinearDifferentialOperator(LinearFunctionOperator):
    """A linear differential operator with scalar output codomain."""

    def __init__(self, coefficients: PartialDerivativeCoefficients):
        self._coefficients = coefficients
        super().__init__(
            input_shapes=(
                coefficients.input_domain_shape,
                coefficients.input_codomain_shape,
            ),
            output_shapes=(coefficients.input_domain_shape, ()),
        )

    @property
    def coefficients(self) -> PartialDerivativeCoefficients:
        return self._coefficients

    def to_sum(self):
        """Decompose into ``(codomain_idx, multi_index, coeff)`` terms
        (reference: ``diffops/_lindiffop.py:55-77``)."""
        return tuple(self._coefficients.items_flat())

    def weak_form(self, test_basis):
        """Weak-form functional hook (reference: ``_lindiffop.py:160``)."""
        raise NotImplementedError(
            f"No weak form registered for {type(self).__name__}."
        )

    def __rmul__(self, other):
        if np.ndim(other) == 0:
            return ScaledLinearDifferentialOperator(self, float(other))
        return NotImplemented

    __mul__ = __rmul__

    def __repr__(self):
        return f"{type(self).__name__}({self._coefficients!r})"


class ScaledLinearDifferentialOperator(LinearDifferentialOperator):
    """``alpha * D`` retaining the inner operator's extra structure
    (e.g. ``weak_form``); reference: ``diffops/_arithmetic.py:10``."""

    def __init__(self, lindiffop: LinearDifferentialOperator, scalar):
        super().__init__(float(scalar) * lindiffop.coefficients)
        self._lindiffop = lindiffop
        self._scalar = float(scalar)

    @property
    def lindiffop(self) -> LinearDifferentialOperator:
        return self._lindiffop

    @property
    def scalar(self) -> float:
        return self._scalar

    def weak_form(self, test_basis):
        return self._scalar * self._lindiffop.weak_form(test_basis)

    def __repr__(self):
        return f"{self._scalar} * {self._lindiffop!r}"


class PartialDerivative(LinearDifferentialOperator):
    """``∂^alpha`` (reference: ``diffops/_partial_derivative.py:17``)."""

    def __init__(self, multi_index):
        multi_index = MultiIndex(multi_index)
        super().__init__(
            PartialDerivativeCoefficients(
                {(): {multi_index: 1.0}},
                input_domain_shape=multi_index.shape,
                input_codomain_shape=(),
            )
        )
        self._multi_index = multi_index

    @property
    def multi_index(self) -> MultiIndex:
        return self._multi_index

    @property
    def order(self) -> int:
        return self._multi_index.order

    def __repr__(self):
        return f"PartialDerivative({self._multi_index!r})"


class Derivative(PartialDerivative):
    """``d^n/dx^n`` on scalar domains (reference: ``_derivative.py:11``)."""

    def __init__(self, order: int = 1):
        if order < 0:
            raise ValueError("order must be non-negative")
        super().__init__(MultiIndex(np.asarray(int(order))))


class TimeDerivative(LinearDifferentialOperator):
    """``∂_t`` where time is the first coordinate (reference:
    ``_partial_derivative.py:131``)."""

    def __init__(self, domain_shape):
        domain_shape = as_shape(domain_shape)
        if domain_shape == ():
            multi_index = MultiIndex(np.asarray(1))
        else:
            assert len(domain_shape) == 1
            multi_index = MultiIndex.from_index((0,), domain_shape, 1)
        super().__init__(
            PartialDerivativeCoefficients(
                {(): {multi_index: 1.0}}, domain_shape, ()
            )
        )


class DirectionalDerivative(LinearDifferentialOperator):
    """``f ↦ <direction, ∇f>`` (reference: ``_directional_derivative.py:15``)."""

    def __init__(self, direction):
        direction = np.asarray(direction, dtype=np.float64)
        domain_shape = direction.shape
        if direction.ndim == 0:
            coeffs = {(): {MultiIndex(np.asarray(1)): float(direction)}}
        else:
            coeffs = {
                (): {
                    MultiIndex.from_index(idx, domain_shape, 1): float(
                        direction[idx]
                    )
                    for idx in np.ndindex(domain_shape)
                    if direction[idx] != 0.0
                }
            }
            if not coeffs[()]:
                coeffs = {(): {MultiIndex(np.zeros(domain_shape, int)): 0.0}}
        super().__init__(
            PartialDerivativeCoefficients(coeffs, domain_shape, ())
        )
        self._direction = direction

    @property
    def direction(self) -> np.ndarray:
        return self._direction


class WeightedLaplacian(LinearDifferentialOperator):
    """``f ↦ sum_i w_i ∂^2_i f`` (reference: ``_laplacian.py:22``)."""

    def __init__(self, weights):
        weights = np.asarray(weights, dtype=np.float64)
        domain_shape = weights.shape
        if weights.ndim == 0:
            coeffs = {(): {MultiIndex(np.asarray(2)): float(weights)}}
        else:
            coeffs = {
                (): {
                    MultiIndex.from_index(idx, domain_shape, 2): float(weights[idx])
                    for idx in np.ndindex(domain_shape)
                    if weights[idx] != 0.0
                }
            }
            if not coeffs[()]:
                coeffs = {(): {MultiIndex(np.zeros(domain_shape, int)): 0.0}}
        super().__init__(
            PartialDerivativeCoefficients(coeffs, domain_shape, ())
        )
        self._weights = weights

    @property
    def weights(self) -> np.ndarray:
        return self._weights


class Laplacian(WeightedLaplacian):
    """Reference: ``_laplacian.py:77``.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import linpde_gp_tpu as lgt
    >>> D = Laplacian(())
    >>> f = lgt.functions.Polynomial([0.0, 0.0, 1.0])  # x**2
    >>> float(D(f)(jnp.asarray(0.7)))  # (x**2)'' == 2
    2.0
    """

    def __init__(self, domain_shape):
        domain_shape = as_shape(domain_shape)
        super().__init__(np.ones(domain_shape))

    def weak_form(self, test_basis):
        from ..functionals.weak_forms import WeakForm_Laplacian_UnivariateInterpolationBasis
        from ...models.functions.fem import UnivariateLinearInterpolationBasis

        if isinstance(test_basis, UnivariateLinearInterpolationBasis):
            return WeakForm_Laplacian_UnivariateInterpolationBasis(test_basis)
        raise NotImplementedError(
            f"No weak form for test basis {type(test_basis).__name__}."
        )


class SpatialLaplacian(WeightedLaplacian):
    """Laplacian over the non-time coordinates of a space-time domain
    (reference: ``_laplacian.py:102``)."""

    def __init__(self, domain_shape):
        domain_shape = as_shape(domain_shape)
        assert len(domain_shape) == 1 and domain_shape[0] >= 2
        weights = np.ones(domain_shape)
        weights[0] = 0.0
        super().__init__(weights)


def HeatOperator(domain_shape, alpha=1.0) -> SumLinearFunctionOperator:
    """``∂_t - alpha * Δ_x`` (reference: ``_heat.py:14`` builds the same
    sum structure)."""
    domain_shape = as_shape(domain_shape)
    lap = SpatialLaplacian(domain_shape)
    time_deriv = TimeDerivative(domain_shape)
    # Both are LinearDifferentialOperators: fuse into a single coefficient
    # table so kernel transforms see one canonical diffop.
    return LinearDifferentialOperator(
        time_deriv.coefficients + (-float(alpha)) * lap.coefficients
    )
