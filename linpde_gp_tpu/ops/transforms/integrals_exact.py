r"""Exact Lebesgue integrals of (transformed) half-integer Matérn kernels.

Parity: reference ``crosscov/linfunctls/integrals/_matern_lebesgue.py``
(exact ``∫k`` antiderivatives and ``∫∫k``) and
``covfuncs/linfunctls/_registry.py:176-196``.

Derivation (independent, same rational-polynomial machinery):  with
``φ(s) = q(s) e^{-s}`` and ``Φ(s) = ∫_0^s φ = R(0) - R(s) e^{-s}`` where
``R = Σ_j q^{(j)}`` (the exponential-integration-by-parts series),

    ∫_a^b φ(c|x - t|) dt = (1/c) [ g(c(x-a)) - g(c(x-b)) ],
    g(s) = sign(s) Φ(|s|)                       (odd primitive)

    ∫_a^b ∫_a^b φ(c|s - t|) dt ds = (2/c²) [ R(0)·T - S(0) + S(T) e^{-T} ],
    S = Σ_j R^{(j)},   T = c(b - a).

Both exact in rational arithmetic; evaluation is one Horner chain per
endpoint instead of a quadrature contraction.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from ...models.functions.polynomial import RationalPolynomial
from ..kernels.stationary import Matern, half_integer_matern_coefficients


@functools.lru_cache(maxsize=None)
def _exp_primitive_poly(coeffs_key) -> tuple:
    """``R = Σ_j p^{(j)}`` such that ``d/ds [-R(s) e^{-s}] = p(s) e^{-s}``."""
    p = RationalPolynomial([Fraction(c) for c in coeffs_key])
    total = p
    d = p
    for _ in range(p.degree):
        d = d.differentiate()
        total = total + d
    return tuple(total.rational_coefficients)


def _matern_R(p_order: int) -> RationalPolynomial:
    q = half_integer_matern_coefficients(p_order)
    return RationalPolynomial(_exp_primitive_poly(tuple(q)))


def matern_integral_crosscov(nu: float, lengthscale: float, a: float, b: float):
    """Return a jittable ``x ↦ ∫_a^b k(x, t) dt`` for a 1-D Matérn."""
    p_order = int(nu - 0.5)
    c = float(np.sqrt(2 * nu) / lengthscale)
    R = _matern_R(p_order)
    R0 = float(R.coefficients[0])
    r_coeffs = tuple(R.coefficients)

    def g(s):
        t = jnp.abs(s)
        horner = jnp.full_like(t, r_coeffs[-1])
        for ck in reversed(r_coeffs[:-1]):
            horner = horner * t + ck
        return jnp.sign(s) * (R0 - horner * jnp.exp(-t))

    def evaluate(x):
        return (g(c * (x - a)) - g(c * (x - b))) / c

    return evaluate


def matern_double_integral(nu: float, lengthscale: float, a: float, b: float) -> float:
    """Exact ``∫_a^b ∫_a^b k(s, t) dt ds`` for a 1-D Matérn."""
    p_order = int(nu - 0.5)
    c = float(np.sqrt(2 * nu) / lengthscale)
    R = _matern_R(p_order)
    S = RationalPolynomial(_exp_primitive_poly(tuple(R.rational_coefficients)))
    T = c * (b - a)
    R0 = float(R.coefficients[0])
    S0 = float(S.coefficients[0])
    s_coeffs = S.coefficients
    horner = s_coeffs[-1]
    for ck in reversed(s_coeffs[:-1]):
        horner = horner * T + ck
    return (2.0 / c**2) * (R0 * T - S0 + horner * float(np.exp(-T)))


def exact_integral_hooks(kernel, functional):
    """If ``kernel`` is a (scaled) 1-D half-integer Matérn and
    ``functional`` a Lebesgue integral over an Interval, return
    ``(crosscov_fn, gram_value)``; otherwise ``None``."""
    from ...models.domains import Interval
    from ..functionals.integrals import LebesgueIntegral
    from ..kernels.arithmetic import ScaledCovarianceFunction

    if not isinstance(functional, LebesgueIntegral):
        return None
    if not isinstance(functional.domain, Interval):
        return None
    scale = 1.0
    k = kernel
    while isinstance(k, ScaledCovarianceFunction):
        scale *= k.scalar
        k = k.covfunc
    if not isinstance(k, Matern) or k.input_size > 1 or k.nu == np.inf:
        return None
    if not k.is_half_integer:
        return None
    a, b = float(functional.domain[0]), float(functional.domain[1])
    l = float(np.ravel(k.lengthscales)[0]) if np.ndim(k.lengthscales) else float(k.lengthscales)
    fn = matern_integral_crosscov(k.nu, l, a, b)
    gram = scale * matern_double_integral(k.nu, l, a, b)

    def crosscov_fn(x):
        return scale * fn(x)

    return crosscov_fn, gram
