"""JAX forward-mode autodiff fallback for differential operators.

Capability parity with the reference's jvp/hessian fallback
(``linfuncops/diffops/_lindiffop.py:103-148``,
``covfuncs/linfuncops/diffops/_registry.py:15-28``): any diffop applies to
any function/kernel even without a registered closed form.  It doubles as
the test oracle (reference test pattern §4.1).

The batched-jvp trick: for pointwise-batched evaluation ``f(x)`` (each
output depends only on its own input point), ``jax.jvp`` along a tangent
that broadcasts a constant direction over the batch computes the
directional derivative at every batch point simultaneously — no ``vmap``
needed, and XLA fuses the resulting towers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...models.functions.base import Function, Zero
from ...models.functions.basic import Constant
from ...models.functions.polynomial import Polynomial
from ..diffops.coefficients import PartialDerivativeCoefficients
from ..kernels.base import CovarianceFunction


def _unit_direction(input_shape, index, dtype):
    if input_shape == ():
        return jnp.ones((), dtype)
    e = np.zeros(input_shape)
    e[index] = 1.0
    return jnp.asarray(e, dtype)


def nested_derivative(fn, multi_index, input_shape):
    """``x ↦ ∂^alpha fn(x)`` for batched pointwise ``fn``."""

    orders = multi_index.array
    derived = fn
    if input_shape == ():
        total = int(orders)
        for _ in range(total):
            derived = _jvp_along(derived, None, input_shape)
    else:
        for index in np.ndindex(input_shape):
            for _ in range(int(orders[index])):
                derived = _jvp_along(derived, index, input_shape)
    return derived


def _jvp_along(fn, index, input_shape):
    def dfn(x):
        direction = _unit_direction(input_shape, index, x.dtype)
        tangent = jnp.broadcast_to(direction, x.shape)
        return jax.jvp(fn, (x,), (tangent,))[1]

    return dfn


class DiffopFunction(Function):
    """``L f`` computed by forward-mode autodiff."""

    def __init__(self, coeffs: PartialDerivativeCoefficients, f: Function):
        self._coeffs = coeffs
        self._f = f
        super().__init__(coeffs.input_domain_shape, ())

    def _evaluate(self, x):
        out = None
        for codomain_idx, multi_index, coeff in self._coeffs.items_flat():

            def component(xx, idx=codomain_idx):
                vals = self._f._evaluate(xx)
                # index trailing codomain dims
                if idx:
                    vals = vals[(Ellipsis,) + idx]
                return vals

            term_fn = nested_derivative(
                component, multi_index, self._coeffs.input_domain_shape
            )
            term = coeff * term_fn(x)
            out = term if out is None else out + term
        return out


def apply_diffop_to_function(coeffs: PartialDerivativeCoefficients, f: Function) -> Function:
    """Apply a coefficient-table diffop to a function, with symbolic
    shortcuts (reference: ``diffops/_functions.py:12`` Constant→Zero)."""
    if isinstance(f, Zero):
        return Zero(coeffs.input_domain_shape, ())
    if isinstance(f, Constant):
        value = None
        for codomain_idx, multi_index, coeff in coeffs.items_flat():
            if multi_index.order == 0:
                c_val = f.value[codomain_idx] if codomain_idx else f.value
                term = coeff * c_val
                value = term if value is None else value + term
        if value is None:
            return Zero(coeffs.input_domain_shape, ())
        return Constant(coeffs.input_domain_shape, value)
    if (
        isinstance(f, Polynomial)
        and coeffs.input_domain_shape == ()
        and list(coeffs.keys()) == [()]
    ):
        result = None
        for _, multi_index, coeff in coeffs.items_flat():
            poly = f
            for _ in range(multi_index.order):
                poly = poly.differentiate()
            term = coeff * poly
            result = term if result is None else result + term
        return result
    from ...models.functions.basic import Piecewise

    if (
        isinstance(f, Piecewise)
        and coeffs.input_domain_shape == ()
        and list(coeffs.keys()) == [()]
        and all(isinstance(p, Polynomial) for p in f.pieces)
    ):
        # Exact piecewise-polynomial differentiation (a.e.; the same
        # convention as the reference's symbolic piecewise rules).
        new_pieces = None
        for _, multi_index, coeff in coeffs.items_flat():
            pieces = []
            for p in f.pieces:
                poly = p
                for _ in range(multi_index.order):
                    poly = poly.differentiate()
                pieces.append(coeff * poly)
            if new_pieces is None:
                new_pieces = pieces
            else:
                new_pieces = [a + b for a, b in zip(new_pieces, pieces)]
        return Piecewise(f.xs, new_pieces)
    return DiffopFunction(coeffs, f)


class AutodiffTransformedKernel(CovarianceFunction):
    """``L0 k L1*`` computed by nested forward-mode autodiff on the
    kernel's single jnp evaluation path.

    Exact for kernels smooth at coincidence (ExpQuad); for kernels defined
    through ``|x0 - x1|`` (Matérn) the diagonal requires the closed forms
    in ``product.py``/``radial.py`` — this class is then only used as an
    off-diagonal test oracle, mirroring the reference's fallback role.
    """

    def __init__(self, base: CovarianceFunction, coeffs0, coeffs1):
        super().__init__(base.input_shape)
        self.base = base
        self.coeffs0 = coeffs0
        self.coeffs1 = coeffs1

    def _evaluate(self, x0, x1):
        input_shape = self.base.input_shape
        x0 = jnp.asarray(x0)
        x1 = jnp.asarray(x1)
        batch_ndim0 = x0.ndim - len(input_shape)
        batch_ndim1 = x1.ndim - len(input_shape)
        batch = jnp.broadcast_shapes(
            x0.shape[:batch_ndim0], x1.shape[:batch_ndim1]
        )
        x0 = jnp.broadcast_to(x0, batch + input_shape)
        x1 = jnp.broadcast_to(x1, batch + input_shape)

        def terms(coeffs):
            if coeffs is None:
                return [((), None, 1.0)]
            return [
                (ci, mi, c) for ci, mi, c in coeffs.items_flat()
            ]

        out = None
        for ci0, mi0, c0 in terms(self.coeffs0):
            for ci1, mi1, c1 in terms(self.coeffs1):

                def base_fn(a0, a1, i0=ci0, i1=ci1):
                    vals = self.base._evaluate(a0, a1)
                    idx = (Ellipsis,) + tuple(i0) + tuple(i1)
                    return vals[idx] if (i0 or i1) else vals

                fn = base_fn
                if mi0 is not None and mi0.order > 0:
                    fn_fixed = fn

                    def fn0(a0, a1, inner=fn_fixed, mi=mi0):
                        g = nested_derivative(
                            lambda z: inner(z, a1), mi, input_shape
                        )
                        return g(a0)

                    fn = fn0
                if mi1 is not None and mi1.order > 0:
                    fn_fixed2 = fn

                    def fn1(a0, a1, inner=fn_fixed2, mi=mi1):
                        g = nested_derivative(
                            lambda z: inner(a0, z), mi, input_shape
                        )
                        return g(a1)

                    fn = fn1
                term = (c0 * c1) * fn(x0, x1)
                out = term if out is None else out + term
        return out
