r"""Closed-form 1-D operator-transformed kernel factors.

The mathematical core of the framework (reference capability:
``covfuncs/linfuncops/diffops/_expquad.py`` and ``_matern.py`` — the
hand-derived ``L0 k L1*`` families).  Instead of one bespoke class per
(operator pair × kernel) combination, we derive the exact polynomial form
of ``∂^m_{x0} ∂^n_{x1} k(x0, x1)`` for any orders via host-side rational
polynomial recurrences, producing a single jittable "profile" per factor:

**Matérn (nu = p + 1/2):**  ``k(d) = q0(t) e^{-t}``, ``t = c|d|``,
``d = x0 - x1``, ``c = sqrt(2 nu)/l``.  Since ``d/dd [r(t) e^{-t}] =
c sign(d) (r' - r)(t) e^{-t}`` for ``d != 0``, the derivative polynomials
obey the recurrence ``r_{N+1} = r_N' - r_N`` and

    ∂^m_{x0} ∂^n_{x1} k = (-1)^n c^N sign(d)^{N mod 2} r_N(t) e^{-t},
    N = m + n.

Differentiability of the Matérn kernel guarantees ``r_N(0) = 0`` for odd
``N <= 2p``, so the expression is continuous at ``d = 0`` (``jnp.sign(0)
= 0`` selects the correct limit) — this removes the diagonal NaN/zero
bugs that plain autodiff through ``|d|`` produces, which is exactly why
the reference derives closed forms (SURVEY.md §7 "hard parts" #2).

**Gaussian (ExpQuad):**  ``k(d) = e^{-z^2}``, ``z = d/(sqrt(2) l)``
(signed, smooth).  ``d/dd [p(z) e^{-z^2}] = (1/(sqrt(2) l)) (p' - 2 z p)(z)
e^{-z^2}``, i.e. the Hermite-type recurrence ``p_{N+1} = p_N' - 2 X p_N``
and

    ∂^m_{x0} ∂^n_{x1} k = (-1)^n (sqrt(2) l)^{-N} p_N(z) e^{-z^2}.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import jax.numpy as jnp

from ...models.functions.polynomial import RationalPolynomial


class UnivariateFactor:
    """A jittable 1-D kernel factor ``f(x0, x1)`` = polynomial profile
    times envelope, with optional sign parity (odd total order).

    Kinds: ``matern`` (``P(t) e^{-t}``, ``t = c|d|``), ``expquad``
    (``P(z) e^{-z²}``, ``z = c d`` signed), ``wendland``
    (``P(t) 1_{t<=1}``, ``t = |d|/l`` — compact support)."""

    __slots__ = ("kind", "scale", "poly", "parity", "prefactor")

    def __init__(self, kind: str, scale: float, poly, parity: int, prefactor: float):
        assert kind in ("matern", "expquad", "wendland")
        self.kind = kind
        self.scale = float(scale)
        self.poly = tuple(float(c) for c in poly)
        self.parity = int(parity)
        self.prefactor = float(prefactor)

    def __call__(self, x0, x1):
        d = x0 - x1
        if self.kind == "matern":
            t = self.scale * jnp.abs(d)
            val = self._horner(t) * jnp.exp(-t)
            if self.parity:
                val = val * jnp.sign(d)
        elif self.kind == "wendland":
            t = self.scale * jnp.abs(d)
            val = jnp.where(t <= 1.0, self._horner(t), 0.0)
            if self.parity:
                val = val * jnp.sign(d)
        else:
            z = self.scale * d
            val = self._horner(z) * jnp.exp(-(z**2))
        return self.prefactor * val

    def _horner(self, t):
        res = jnp.full_like(t, self.poly[-1])
        for c in reversed(self.poly[:-1]):
            res = res * t + c
        return res

    def __repr__(self):
        return (
            f"UnivariateFactor({self.kind}, scale={self.scale}, "
            f"poly={self.poly}, parity={self.parity}, pref={self.prefactor})"
        )


@functools.lru_cache(maxsize=None)
def _matern_derivative_polynomial(p: int, N: int) -> RationalPolynomial:
    from ..kernels.stationary import half_integer_matern_coefficients

    poly = RationalPolynomial(half_integer_matern_coefficients(p))
    for _ in range(N):
        poly = poly.differentiate() - poly
    return poly


@functools.lru_cache(maxsize=None)
def _gaussian_derivative_polynomial(N: int) -> RationalPolynomial:
    poly = RationalPolynomial([Fraction(1)])
    x = RationalPolynomial([Fraction(0), Fraction(1)])
    for _ in range(N):
        poly = poly.differentiate() - RationalPolynomial([Fraction(0), Fraction(2)]) * poly
    return poly


def matern_factor(nu: float, lengthscale: float, m: int, n: int) -> UnivariateFactor:
    """``∂^m_{x0} ∂^n_{x1}`` of a 1-D Matérn kernel with smoothness ``nu``."""
    import numpy as np

    if nu == np.inf:
        return expquad_factor(lengthscale, m, n)
    p = int(nu - 0.5)
    assert float(nu) == p + 0.5, "only half-integer nu has closed forms"
    N = m + n
    if N > 2 * p:
        raise ValueError(
            f"Matérn(nu={nu}) is only {2 * p}-times differentiable; "
            f"requested total derivative order {N}."
        )
    c = float(np.sqrt(2 * nu) / lengthscale)
    poly = _matern_derivative_polynomial(p, N)
    prefactor = ((-1.0) ** n) * c**N
    return UnivariateFactor(
        "matern", c, poly.coefficients, parity=N % 2, prefactor=prefactor
    )


def expquad_factor(lengthscale: float, m: int, n: int) -> UnivariateFactor:
    """``∂^m_{x0} ∂^n_{x1}`` of a 1-D ExpQuad kernel."""
    import numpy as np

    N = m + n
    s = 1.0 / (np.sqrt(2.0) * float(lengthscale))
    poly = _gaussian_derivative_polynomial(N)
    prefactor = ((-1.0) ** n) * s**N
    return UnivariateFactor("expquad", s, poly.coefficients, parity=0, prefactor=prefactor)


@functools.lru_cache(maxsize=None)
def _wendland_derivative_polynomial(d_dim: int, k: int, N: int) -> RationalPolynomial:
    from ..kernels.wendland import wendland_polynomial

    poly = wendland_polynomial(d_dim, k)
    for _ in range(N):
        poly = poly.differentiate()
    return poly


def wendland_factor(
    d_dim: int, k: int, lengthscale: float, m: int, n: int
) -> UnivariateFactor:
    """``∂^m_{x0} ∂^n_{x1}`` of a 1-D Wendland ``φ_{d,k}`` kernel.

    ``φ(|d|/l)`` with polynomial ``p`` on ``[0, 1]`` gives

        ∂^m_{x0} ∂^n_{x1} k = (-1)^n l^{-N} sign(d)^{N mod 2}
                              p^{(N)}(t) 1_{t<=1},   N = m + n <= 2k.

    ``φ_{d,k} ∈ C^{2k}`` guarantees both boundary continuity (``p``
    vanishes to order ``floor(d/2)+2k+1`` at ``t = 1``) and
    ``p^{(N)}(0) = 0`` for odd ``N <= 2k`` — so ``jnp.sign(0) = 0``
    selects the exact diagonal limit, same as the Matérn family (the
    reference has NO Wendland diffop closed forms; autodiff through
    ``|d|`` breaks on the diagonal — SURVEY.md §7 hard part #2)."""
    N = m + n
    if N > 2 * k:
        raise ValueError(
            f"Wendland(d={d_dim}, k={k}) is only {2 * k}-times "
            f"differentiable; requested total derivative order {N}."
        )
    c = 1.0 / float(lengthscale)
    poly = _wendland_derivative_polynomial(int(d_dim), int(k), N)
    prefactor = ((-1.0) ** n) * c**N
    return UnivariateFactor(
        "wendland", c, poly.coefficients, parity=N % 2, prefactor=prefactor
    )
