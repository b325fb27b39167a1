r"""Closed-form diffop transforms of isotropic (radial) multivariate
half-integer Matérn kernels.

Parity target: the reference's multivariate Matérn families
(``covfuncs/linfuncops/diffops/_matern.py:17,138``) — directional
derivatives, weighted Laplacians and their combinations.

Math (derived independently).  Write ``z_i = c_i (x0_i - x1_i)`` with
``c_i = sqrt(2 nu)/l_i`` and ``t = ||z||``; the kernel is ``g(z) = φ(t)``
with ``φ(t) = q(t) e^{-t}`` (Matérn polynomial ``q``).  Derivatives of a
radial function obey the pairing formula

    ∂^γ_z g = Σ_{pairings of the γ index multiset}
                (Π δ over pairs) (Π z_i over singletons) ψ_{n-m}(t)

with ``n = |γ|``, ``m`` pairs, and ``ψ_{k+1} = ψ_k' / t``, ``ψ_0 = φ``.
Each ``ψ_k`` has the exact form ``s_k(t) t^{-j_k} e^{-t}`` with the
rational recurrence

    s_{k+1} = t s_k' - (j_k + t) s_k,   j_{k+1} = j_k + 2,

reduced by the exact power of ``t`` dividing ``s_{k+1}``.  Because every
monomial attached to ``ψ_k`` has degree ``2k - n >= j_k`` (smoothness
``n <= 2p``), the full expression is bounded as ``t -> 0``; the exact
value AT ``z = 0`` is computed separately from the even Taylor
coefficients of ``φ``:

    ∂^γ g(0) = a_n * n/2! / Π (γ_i/2)! * Π γ_i!   (all γ_i even, n even)

where ``a_n`` is the ``t^n`` Taylor coefficient of ``φ``.

Finally ``∂^α_{x0} ∂^β_{x1} k = (-1)^{|β|} (Π c^{α+β}) ∂^{α+β}_z g``.
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from ...models.functions.polynomial import RationalPolynomial
from ..kernels.base import CovarianceFunction
from ..kernels.stationary import Matern, half_integer_matern_coefficients


@functools.lru_cache(maxsize=None)
def _psi(p: int, k: int):
    """``(s_k coefficients, j_k)`` with ``ψ_k = s_k(t) t^{-j_k} e^{-t}``."""
    if k == 0:
        q = RationalPolynomial(half_integer_matern_coefficients(p))
        return q, 0
    s_prev, j_prev = _psi(p, k - 1)
    t = RationalPolynomial([Fraction(0), Fraction(1)])
    s = t * s_prev.differentiate() - (
        RationalPolynomial([Fraction(j_prev)]) + t
    ) * s_prev
    j = j_prev + 2
    # Reduce by the exact power of t dividing s.
    coeffs = list(s.rational_coefficients)
    val = 0
    while val < len(coeffs) - 1 and coeffs[val] == 0 and val < j:
        val += 1
    if val:
        coeffs = coeffs[val:]
        j -= val
    return RationalPolynomial(coeffs), j


@functools.lru_cache(maxsize=None)
def _phi_taylor_coeff(p: int, n: int) -> Fraction:
    """``t^n`` Taylor coefficient of ``φ(t) = q(t) e^{-t}``."""
    q = half_integer_matern_coefficients(p)
    total = Fraction(0)
    for j, qj in enumerate(q):
        if j <= n:
            total += qj * Fraction((-1) ** (n - j), math.factorial(n - j))
    return total


def _pairings(indices):
    """All ways to split the index list into pairs + singletons.

    Yields ``(pairs, singles)`` where pairs is a list of (a, b) index
    VALUES and singles a list of index values.
    """
    if not indices:
        yield [], []
        return
    first, rest = indices[0], indices[1:]
    # first stays single
    for pairs, singles in _pairings(rest):
        yield pairs, [first] + singles
    # first pairs with each later element (by position)
    for pos in range(len(rest)):
        partner = rest[pos]
        remaining = rest[:pos] + rest[pos + 1 :]
        for pairs, singles in _pairings(remaining):
            yield [(first, partner)] + pairs, singles


def _gamma_zero_value(p: int, gamma) -> Fraction:
    """Exact ``∂^γ g`` at ``z = 0``."""
    n = int(sum(gamma))
    if n % 2 == 1 or any(int(gi) % 2 for gi in gamma):
        return Fraction(0)
    m = n // 2
    a_n = _phi_taylor_coeff(p, n)
    coeff = Fraction(math.factorial(m))
    for gi in gamma:
        coeff /= math.factorial(int(gi) // 2)
        coeff *= math.factorial(int(gi))
    return a_n * coeff


class RadialMaternDerivativeKernel(CovarianceFunction):
    """``L0 k L1*`` for isotropic multivariate half-integer Matérn."""

    def __init__(self, base: Matern, coeffs0, coeffs1):
        super().__init__(base.input_shape)
        self.base = base
        self.coeffs0 = coeffs0
        self.coeffs1 = coeffs1

        p = base.p
        self._p = p
        c = np.asarray(base.scale_factors, dtype=np.float64).reshape(-1)
        d = c.shape[0]
        self._c = c

        def term_list(coeffs):
            if coeffs is None:
                return [(1.0, (0,) * d)]
            out = []
            for codomain_idx, mi, coeff in coeffs.items_flat():
                if codomain_idx != ():
                    raise ValueError("scalar codomain only")
                out.append((coeff, mi.factorize_dimwise()))
            return out

        # Aggregate: {(k, mono): float_coeff}; plus exact zero-limit.
        agg: dict = {}
        zero_limit = 0.0
        for c0v, alpha in term_list(coeffs0):
            for c1v, beta in term_list(coeffs1):
                gamma = tuple(a + b for a, b in zip(alpha, beta))
                n = sum(gamma)
                if n > 2 * p:
                    raise ValueError(
                        f"derivative order {n} exceeds Matérn smoothness {2 * p}"
                    )
                pref = (
                    c0v
                    * c1v
                    * ((-1.0) ** sum(beta))
                    * float(np.prod(c**np.asarray(gamma)))
                )
                # index multiset
                indices = []
                for i, gi in enumerate(gamma):
                    indices.extend([i] * gi)
                for pairs, singles in _pairings(indices):
                    if any(a != b for a, b in pairs):
                        continue
                    m = len(pairs)
                    k = n - m
                    mono = [0] * d
                    for i in singles:
                        mono[i] += 1
                    key = (k, tuple(mono))
                    agg[key] = agg.get(key, 0.0) + pref
                zero_limit += pref * float(_gamma_zero_value(p, gamma))

        # Resolve psi polynomials.
        self._terms = []
        for (k, mono), coeff in agg.items():
            if coeff == 0.0:
                continue
            s_k, j_k = _psi(p, k)
            self._terms.append(
                (float(coeff), mono, tuple(s_k.coefficients), int(j_k))
            )
        self._zero_limit = float(zero_limit)

    def _evaluate(self, x0, x1):
        d = x0 - x1
        if self.input_ndim == 0:
            z = (d * self._c[0])[..., None]
        else:
            z = d * self._c
        t2 = jnp.sum(z**2, axis=-1)
        t = jnp.sqrt(jnp.where(t2 > 0, t2, 1.0))  # guarded sqrt
        is_zero = t2 == 0
        expt = jnp.exp(-t)
        total = None
        for coeff, mono, s_coeffs, j in self._terms:
            poly = jnp.full_like(t, s_coeffs[-1])
            for ck in reversed(s_coeffs[:-1]):
                poly = poly * t + ck
            val = coeff * poly * expt
            if j:
                val = val / t**j
            for i, e in enumerate(mono):
                if e:
                    val = val * z[..., i] ** e
            total = val if total is None else total + val
        return jnp.where(is_zero, self._zero_limit, total)


def transform_radial_kernel(base, coeffs0, coeffs1):
    """Dispatch hook: radial closed form for isotropic multivariate
    half-integer Matérn; ``None`` for anything else."""
    if not isinstance(base, Matern):
        return None
    if base.nu == np.inf or not base.is_half_integer:
        return None
    if base.input_size <= 1:
        return None  # product path handles 1-D
    try:
        return RadialMaternDerivativeKernel(base, coeffs0, coeffs1)
    except ValueError:
        return None
