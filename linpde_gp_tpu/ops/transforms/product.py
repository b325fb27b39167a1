r"""Operator-transformed kernels via tensor-product distribution.

Generalizes the reference's ``TensorProduct_LinDiffOp_LinDiffOp``
(``covfuncs/linfuncops/diffops/_tensor_product.py:21``) and its per-family
closed-form classes: for a product kernel ``k(x0, x1) = prod_i k_i(x0_i,
x1_i)`` and diffops ``L0 = sum_a c0_a ∂^{alpha_a}``, ``L1 = sum_b c1_b
∂^{beta_b}`` (constant coefficients, scalar codomain),

    (L0 k L1*)(x0, x1)
      = sum_{a,b} c0_a c1_b prod_i ∂^{alpha_a[i]}_{x0_i} ∂^{beta_b[i]}_{x1_i} k_i

— a sum of products of closed-form 1-D factors (``univariate.py``),
memoized per ``(i, m, n)``.  This single code path covers: ExpQuad in any
dimension (it factorizes exactly), TensorProduct Matérn (heat equation,
2-D Poisson), and univariate Matérn — with exact diagonal values.
"""

from __future__ import annotations

import numpy as np

from ..kernels.base import CovarianceFunction
from ..kernels.stationary import ExpQuad, Matern
from ..kernels.tensor_product import TensorProduct
from .univariate import (
    UnivariateFactor,
    expquad_factor,
    matern_factor,
    wendland_factor,
)


def product_factor_specs(kernel: CovarianceFunction):
    """Decompose a kernel into per-dimension 1-D factor constructors.

    Returns a list ``[fn(m, n) -> UnivariateFactor]`` (one per input
    dimension), or ``None`` if the kernel is not product-decomposable.
    """
    if isinstance(kernel, ExpQuad):
        ls = np.broadcast_to(kernel.lengthscales, kernel.input_shape).reshape(-1)
        if ls.size == 0:
            ls = np.asarray([float(kernel.lengthscales)])
        return [
            (lambda m, n, l=float(l): expquad_factor(l, m, n)) for l in np.atleast_1d(ls)
        ]
    if isinstance(kernel, Matern):
        if kernel.input_size > 1:
            return None  # isotropic multivariate Matérn is not a product
        if kernel.nu != np.inf and not kernel.is_half_integer:
            return None  # general nu: Bessel eval, autodiff fallback
        l = float(np.ravel(kernel.lengthscales)[0]) if kernel.lengthscales.size else float(kernel.lengthscales)
        nu = kernel.nu
        return [lambda m, n, l=l, nu=nu: matern_factor(nu, l, m, n)]
    from ..kernels.wendland import WendlandCovarianceFunction

    if isinstance(kernel, WendlandCovarianceFunction):
        if kernel.input_size > 1:
            return None  # isotropic multivariate Wendland is radial
        l = float(np.ravel(kernel.lengthscales)[0]) if np.ndim(kernel.lengthscales) else float(kernel.lengthscales)
        dd, kk = kernel.d, kernel.k
        return [lambda m, n, l=l, dd=dd, kk=kk: wendland_factor(dd, kk, l, m, n)]
    if isinstance(kernel, TensorProduct):
        specs = []
        for f in kernel.factors:
            sub = product_factor_specs(f)
            if sub is None or len(sub) != 1:
                return None
            specs.append(sub[0])
        return specs
    return None


class SumOfProductsKernel(CovarianceFunction):
    """``k(x0, x1) = sum_t coeff_t prod_i f_{t,i}(x0_i, x1_i)``.

    The closed-form representation of ``L0 k L1*`` for product-structured
    base kernels.  Stores the provenance ``(base, coeffs0, coeffs1)`` so
    that applying further operators composes symbolically (the
    "already-transformed-kernel" registrations of the reference's rule
    table, ``diffops/_registry.py:54-72,156-215``).
    """

    def __init__(
        self,
        input_shape,
        terms,
        base: CovarianceFunction | None = None,
        coeffs0=None,
        coeffs1=None,
    ):
        super().__init__(input_shape)
        # terms: list of (coeff, [UnivariateFactor per dim])
        self._terms = [
            (float(c), tuple(factors)) for c, factors in terms if c != 0.0
        ]
        if not self._terms:
            self._terms = [(0.0, tuple(terms[0][1]))] if terms else []
        self.base = base
        self.coeffs0 = coeffs0
        self.coeffs1 = coeffs1

    @property
    def terms(self):
        return self._terms

    def linop(self, X0, X1=None):
        """Sum-of-Kronecker Gram structure on ``TensorProductGrid``s
        (reference parity: ``diffops/_tensor_product.py:140-156``)."""
        from ...models.domains.grid import grid_factors
        from ..linalg.linops import Dense, Kronecker, SumOperator

        if self.input_ndim == 0:
            return super().linop(X0, X1)
        f0 = grid_factors(X0)
        f1 = grid_factors(X1) if X1 is not None else f0
        ndims = self.input_shape[0]
        if f0 is None or f1 is None or len(f0) != ndims or len(f1) != ndims:
            return super().linop(X0, X1)
        import jax.numpy as jnp

        factor_gram_cache: dict = {}

        def factor_gram(i, f):
            key = (i, id(f))
            if key not in factor_gram_cache:
                g0 = jnp.asarray(np.asarray(f0[i]))
                g1 = jnp.asarray(np.asarray(f1[i]))
                factor_gram_cache[key] = Dense(f(g0[:, None], g1[None, :]))
            return factor_gram_cache[key]

        term_ops = []
        for coeff, factors in self._terms:
            op = None
            for i, f in enumerate(factors):
                g = factor_gram(i, f)
                op = g if op is None else Kronecker(op, g)
            term_ops.append(op * coeff)
        if len(term_ops) == 1:
            return term_ops[0]
        return SumOperator(*term_ops)

    def _evaluate(self, x0, x1):
        scalar_input = self.input_ndim == 0
        # Memoize factor evaluations shared across terms (e.g. the heat
        # operator reuses identity/derivative factors in several terms);
        # XLA would CSE these, but deduplicating here keeps trace size
        # and eager dispatch count down.
        cache: dict = {}

        def factor_val(i, f):
            key = (i, id(f))
            if key not in cache:
                a0 = x0 if scalar_input else x0[..., i]
                a1 = x1 if scalar_input else x1[..., i]
                cache[key] = f(a0, a1)
            return cache[key]

        out = None
        for coeff, factors in self._terms:
            term = None
            for i, f in enumerate(factors):
                val = factor_val(i, f)
                term = val if term is None else term * val
            term = coeff * term
            out = term if out is None else out + term
        return out


def transform_product_kernel(
    kernel: CovarianceFunction, coeffs0, coeffs1
) -> SumOfProductsKernel | None:
    """Build the closed-form ``L0 k L1*`` for a product-decomposable
    kernel.  ``coeffs0`` / ``coeffs1`` are ``PartialDerivativeCoefficients``
    with scalar codomain, or ``None`` for the identity."""
    specs = product_factor_specs(kernel)
    if specs is None:
        return None

    def term_list(coeffs):
        if coeffs is None:
            return [((), 1.0, None)]
        out = []
        for codomain_idx, multi_index, coeff in coeffs.items_flat():
            if codomain_idx != ():
                return None  # multi-output handled by dedicated rules
            out.append((codomain_idx, coeff, multi_index.factorize_dimwise()))
        return out

    t0 = term_list(coeffs0)
    t1 = term_list(coeffs1)
    if t0 is None or t1 is None:
        return None

    ndims = len(specs)
    factor_cache: dict = {}

    def factor(i, m, n):
        key = (i, m, n)
        if key not in factor_cache:
            factor_cache[key] = specs[i](m, n)
        return factor_cache[key]

    terms = []
    for _, c0, alpha in t0:
        for _, c1, beta in t1:
            orders0 = alpha if alpha is not None else (0,) * ndims
            orders1 = beta if beta is not None else (0,) * ndims
            if len(orders0) != ndims or len(orders1) != ndims:
                return None
            try:
                factors = [
                    factor(i, orders0[i], orders1[i]) for i in range(ndims)
                ]
            except ValueError:
                return None  # derivative order exceeds kernel smoothness
            terms.append((c0 * c1, factors))

    return SumOfProductsKernel(
        kernel.input_shape, terms, base=kernel, coeffs0=coeffs0, coeffs1=coeffs1
    )
