r"""Closed-form diffop transforms of isotropic (radial) multivariate
Matérn kernels.

Parity target: the reference's multivariate ``HalfIntegerMatern_Identity_
DirectionalDerivative`` / ``HalfIntegerMatern_DirectionalDerivative_
DirectionalDerivative`` families (``covfuncs/linfuncops/diffops/_matern.py``).

Math (derived independently): for ``k(x0, x1) = φ(t)`` with
``t = c ||x0 - x1||`` (isotropic scale ``c = sqrt(2 nu)/l``, equal
lengthscales), ``d = x0 - x1``:

    ∂_{x0,i} k = c^2 d_i * Ψ1(t),          Ψ1 = φ'(t)/t / c ... (see below)
    ∂_{x0,i} ∂_{x1,j} k = -c^2 δ_ij Ψ1(t) - c^4 d_i d_j Ψ2(t)

where, writing ``φ(t) = q(t) e^{-t}`` (half-integer Matérn polynomial q),

    Ψ1(t) = (q' - q)(t)/t * e^{-t}
    Ψ2(t) = d/dt[Ψ1]/t  = ((q'' - 2 q' + q)(t) t - (q' - q)(t)) / t^3 * e^{-t}

Both ``(q' - q)`` and ``((q''-2q'+q) X - (q'-q))`` are divisible by ``X``
and ``X^3`` respectively EXACTLY in the polynomial ring (a consequence of
the kernel's differentiability), so the ratios are polynomials and the
expressions are globally smooth — including the diagonal ``t = 0`` —
with no numerically unstable division.  All divisions are performed on
exact rational coefficients at construction time.
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from ...models.functions.polynomial import RationalPolynomial
from ..kernels.base import CovarianceFunction
from ..kernels.stationary import Matern, half_integer_matern_coefficients


def _exact_divide_by_power(poly: RationalPolynomial, power: int) -> RationalPolynomial:
    coeffs = poly.rational_coefficients
    assert all(c == 0 for c in coeffs[:power]), (
        f"polynomial {poly!r} is not divisible by X^{power}"
    )
    rest = coeffs[power:]
    return RationalPolynomial(rest if rest else [Fraction(0)])


class RadialMaternDerivativeKernel(CovarianceFunction):
    """``L0 k L1*`` for isotropic multivariate half-integer Matérn with
    first/second-order diffops (directional derivatives, weighted
    Laplacians and their combinations up to total order 2 per slot)."""

    def __init__(self, base: Matern, coeffs0, coeffs1):
        super().__init__(base.input_shape)
        self.base = base
        self.coeffs0 = coeffs0
        self.coeffs1 = coeffs1
        raise NotImplementedError  # placeholder; see transform_radial_kernel


def transform_radial_kernel(base, coeffs0, coeffs1):
    """Radial closed forms — not yet wired; the autodiff fallback handles
    off-diagonal evaluation and dedicated closed forms land with the
    multivariate-Matérn milestone."""
    return None
