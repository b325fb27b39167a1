"""Functional application dispatch (the ``L(·)`` rule table).

Parity: the reference's functional registries
(``covfuncs/linfunctls/_registry.py``, ``crosscov/linfunctls/*``,
``functions/_linfunctls.py``) — realized as one pure dispatch function
with symbolic exact-integral shortcuts and a generic
discretization-contraction path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...models.functions.base import Function, Zero
from ...models.functions.basic import Constant, Piecewise
from ...models.functions.fem import UnivariateLinearInterpolationBasis
from ...models.functions.polynomial import Polynomial
from ...models.domains import Interval
from ..crosscov.base import (
    KernelFunctionalCrossCov,
    ProcessVectorCrossCovariance,
    apply_functional_to_crosscov,
)
from ..functionals.base import (
    CompositeLinearFunctional,
    LinearFunctional,
    ScaledLinearFunctional,
    SumLinearFunctional,
)
from ..functionals.integrals import LebesgueIntegral
from ..functionals.weak_forms import WeakForm_Laplacian_UnivariateInterpolationBasis
from ..kernels.base import CovarianceFunction


def apply_functional(functional: LinearFunctional, obj, /, **kwargs):
    from ...models.gp import ConditionalGaussianProcess, GaussianProcess
    from ...models.randprocs import DeterministicProcess
    from ...models.randvars import Constant as ConstantRV, Normal

    # -- weak form applied to a trial basis → stiffness matrix -----------
    if isinstance(functional, WeakForm_Laplacian_UnivariateInterpolationBasis):
        if isinstance(obj, UnivariateLinearInterpolationBasis):
            return functional.stiffness_matrix(obj)

    if isinstance(obj, CovarianceFunction):
        argnum = kwargs.get("argnum", 1)
        return KernelFunctionalCrossCov(obj, functional, argnum)

    if isinstance(obj, ProcessVectorCrossCovariance):
        return apply_functional_to_crosscov(functional, obj)

    if isinstance(obj, ConditionalGaussianProcess):
        # Posterior functional marginal reusing cached factor/weights
        # (reference ``_conditional.py:453-467``).
        block = apply_functional_to_crosscov(functional, obj.kLas).matrix
        prior_rv = apply_functional(functional, obj.prior)
        mean = prior_rv.mean.reshape(-1) + block @ obj.representer_weights
        # Routes through the posterior's solver (mixed-precision refined
        # when enabled, plain Cholesky otherwise).
        cov = prior_rv.cov.matrix - block @ obj.solve_gram(block.T)
        from ..linalg.covariance import Covariance

        return Normal(
            mean.reshape(functional.output_shape),
            Covariance(cov, functional.output_shape, functional.output_shape),
        )

    if isinstance(obj, GaussianProcess):
        kLa = apply_functional(functional, obj.cov, argnum=1)
        gram = apply_functional_to_crosscov(functional, kLa)
        mean = functional.apply_to_function(obj.mean)
        return Normal(mean, gram)

    if isinstance(obj, DeterministicProcess):
        return ConstantRV(apply_functional(functional, obj.as_fn()))

    if isinstance(obj, Function):
        return _apply_to_function_symbolic(functional, obj)

    raise TypeError(
        f"Cannot apply functional {functional!r} to {type(obj).__name__}."
    )


def _apply_to_function_symbolic(functional: LinearFunctional, f: Function):
    """Function application with exact shortcuts (reference:
    ``linfunctls/_integrals.py:59``, ``functions/_linfunctls.py:9-33``)."""
    if isinstance(f, Zero):
        return jnp.zeros(functional.output_shape)

    if isinstance(
        functional, WeakForm_Laplacian_UnivariateInterpolationBasis
    ) and isinstance(f, UnivariateLinearInterpolationBasis):
        return functional.stiffness_matrix(f)

    if isinstance(functional, ScaledLinearFunctional):
        return functional.scalar * _apply_to_function_symbolic(
            functional.linfunctl, f
        )
    if isinstance(functional, SumLinearFunctional):
        out = None
        for s in functional.summands:
            term = _apply_to_function_symbolic(s, f)
            out = term if out is None else out + term
        return out
    if isinstance(functional, CompositeLinearFunctional):
        from .dispatch import apply_operator_to_function

        g = f
        if functional.linfuncop is not None:
            g = apply_operator_to_function(functional.linfuncop, g)
        vals = _apply_to_function_symbolic(functional.linfunctl, g)
        if functional.linop is not None:
            vals = functional.linop @ jnp.asarray(vals).reshape(-1)
        return jnp.asarray(vals).reshape(functional.output_shape)

    if isinstance(functional, LebesgueIntegral):
        exact = _exact_lebesgue_integral(functional, f)
        if exact is not None:
            return exact

    return functional.apply_to_function(f)


def _exact_lebesgue_integral(functional: LebesgueIntegral, f: Function):
    domain = functional.domain
    if isinstance(f, Constant):
        return jnp.asarray(f.value * domain.volume)
    if isinstance(domain, Interval):
        a, b = float(domain[0]), float(domain[1])
        if isinstance(f, Polynomial):
            anti = f.integrate()
            return jnp.asarray(anti(jnp.asarray(b)) - anti(jnp.asarray(a)))
        if isinstance(f, Piecewise) and all(
            isinstance(p, Polynomial) for p in f.pieces
        ):
            total = 0.0
            for piece, lo, hi in zip(f.pieces, f.xs[:-1], f.xs[1:]):
                lo_c = max(lo, a)
                hi_c = min(hi, b)
                if hi_c <= lo_c:
                    continue
                anti = piece.integrate()
                total = total + (
                    anti(jnp.asarray(float(hi_c))) - anti(jnp.asarray(float(lo_c)))
                )
            return jnp.asarray(total)
    return None
