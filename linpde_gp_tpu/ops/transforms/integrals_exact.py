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


def _matern_Rt(p_order: int) -> RationalPolynomial:
    """``Rt = Σ_j (s·q)^{(j)}`` so ``Ψ(s) = ∫_0^s t q(t) e^{-t} dt
    = Rt(0) − Rt(s) e^{-s}`` (first-moment primitive)."""
    q = half_integer_matern_coefficients(p_order)
    tq = (Fraction(0),) + tuple(Fraction(c) for c in q)  # s·q(s)
    return RationalPolynomial(_exp_primitive_poly(tq))


def matern_hat_projection_crosscov(nu: float, lengthscale: float, basis):
    r"""Exact ``x ↦ [∫ φ_i(t) k(x, t) dt]_i`` for half-integer Matérn.

    Reference parity + generalization: the reference carries this closed
    form only for ν = 3/2 (``crosscov/linfunctls/projections.py:131``);
    the rational-recurrence machinery here covers every half-integer
    order.  Derivation: each hat is two linear pieces ``w(t) = α t + β``
    on ``[a, b]``; with ``u = t − x``,

        ∫_a^b (α t + β) φ(c|t − x|) dt
            = (α x + β) A(x) + α B(x),
        A(x) = (1/c)  [g(c(x−a)) − g(c(x−b))],   g(s) = sign(s) Φ(|s|),
        B(x) = −(1/c²)[G(c(x−a)) − G(c(x−b))],   G(s) = Ψ(|s|),

    where ``Φ/Ψ`` are the zeroth/first-moment primitives of
    ``q(s)e^{-s}`` (exponential integration-by-parts series, exact in
    rational arithmetic).  Evaluation is four Horner chains per segment
    endpoint — jittable, O(n·m) VPU work.
    """
    p_order = int(nu - 0.5)
    c = float(np.sqrt(2 * nu) / lengthscale)
    R = _matern_R(p_order)
    Rt = _matern_Rt(p_order)
    r_coeffs = tuple(R.coefficients)
    rt_coeffs = tuple(Rt.coefficients)
    R0 = float(r_coeffs[0])
    Rt0 = float(rt_coeffs[0])

    # Segment tables: (m, 2) arrays of [a, b, alpha, beta] + validity.
    x_im1, x_i, x_ip1 = basis.x_im1, basis.x_i, basis.x_ip1
    ls = 1.0 / (x_i - x_im1)
    rs = 1.0 / (x_ip1 - x_i)
    a = np.stack([x_im1, x_i], axis=1)
    b = np.stack([x_i, x_ip1], axis=1)
    alpha = np.stack([ls, -rs], axis=1)
    beta = np.stack([-x_im1 * ls, x_ip1 * rs], axis=1)
    valid = np.ones_like(a, dtype=bool)
    if not basis.zero_boundary:
        valid[0, 0] = False   # boundary hats: flat extension clamped to 0
        valid[-1, 1] = False
    alpha = np.where(valid, alpha, 0.0)
    beta = np.where(valid, beta, 0.0)

    a_j = jnp.asarray(a)
    b_j = jnp.asarray(b)
    alpha_j = jnp.asarray(alpha)
    beta_j = jnp.asarray(beta)

    def _horner(coeffs, t):
        h = jnp.full_like(t, coeffs[-1])
        for ck in reversed(coeffs[:-1]):
            h = h * t + ck
        return h

    def g(s):  # odd primitive of φ(|·|)
        t = jnp.abs(s)
        return jnp.sign(s) * (R0 - _horner(r_coeffs, t) * jnp.exp(-t))

    def G(s):  # even first-moment primitive
        t = jnp.abs(s)
        return Rt0 - _horner(rt_coeffs, t) * jnp.exp(-t)

    def evaluate(x):
        # x: (...,) scalar domain; returns (..., m).
        xe = x[..., None, None]  # vs (m, 2) segment tables
        sa = c * (xe - a_j)
        sb = c * (xe - b_j)
        A = (g(sa) - g(sb)) / c
        B = -(G(sa) - G(sb)) / c**2
        seg = (alpha_j * xe + beta_j) * A + alpha_j * B
        return jnp.sum(seg, axis=-1)

    return evaluate


def exact_projection_crosscov(kernel, functional):
    """If ``kernel`` is a (scaled) 1-D half-integer Matérn and
    ``functional`` a hat-basis load vector / L2 projection, return the
    exact jittable crosscov ``x ↦ (..., n_basis)``; else ``None``."""
    from ..functionals.projections import (
        BasisIntegralFunctional,
        L2Projection_UnivariateLinearInterpolationBasis,
    )
    from ..kernels.arithmetic import ScaledCovarianceFunction

    normalizer = None
    if isinstance(functional, L2Projection_UnivariateLinearInterpolationBasis):
        basis = functional.basis
        if functional.normalized:
            normalizer = functional.normalizer
    elif isinstance(functional, BasisIntegralFunctional):
        basis = functional.basis
    else:
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
    l = (
        float(np.ravel(k.lengthscales)[0])
        if np.ndim(k.lengthscales)
        else float(k.lengthscales)
    )
    fn = matern_hat_projection_crosscov(k.nu, l, basis)
    norm_j = None if normalizer is None else jnp.asarray(normalizer)

    squeeze_input = k.input_shape == (1,)

    def crosscov_fn(x):
        if squeeze_input:
            x = x[..., 0]
        vals = scale * fn(x)
        if norm_j is not None:
            vals = vals @ norm_j.T
        return vals

    return crosscov_fn


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
