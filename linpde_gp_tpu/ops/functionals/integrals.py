"""Lebesgue integral functionals via fixed Gauss-Legendre panels.

Parity: reference ``linfunctls/_integrals.py:13`` (``LebesgueIntegral``
over ``Interval``/``Box`` with adaptive ``scipy.quad``/``nquad``
fallback).  Design delta: fixed-order composite Gauss-Legendre — static
shapes, jittable, vectorizes the Gram contraction into a single weighted
matmul; with ``config.quadrature_order * quadrature_panels`` nodes the
result is exact to machine precision for the analytic kernels involved.
Exact symbolic rules (polynomials, constants) short-circuit in
``transforms/functionals.py``.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ...config import config
from ...models.domains import Box, CartesianProduct, Domain, Interval, asdomain
from .base import Discretization, LinearFunctional


@functools.lru_cache(maxsize=None)
def _gauss_legendre(order: int):
    nodes, weights = np.polynomial.legendre.leggauss(order)
    return nodes, weights


def interval_quadrature(a: float, b: float, order: int, panels: int):
    """Composite Gauss-Legendre nodes/weights on ``[a, b]``."""
    nodes, weights = _gauss_legendre(order)
    edges = np.linspace(a, b, panels + 1)
    all_nodes = []
    all_weights = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        mid = 0.5 * (lo + hi)
        half = 0.5 * (hi - lo)
        all_nodes.append(mid + half * nodes)
        all_weights.append(half * weights)
    return np.concatenate(all_nodes), np.concatenate(all_weights)


class LebesgueIntegral(LinearFunctional):
    r"""``f ↦ ∫_domain f(x) dx``.

    Applied to a :class:`GaussianProcess` it returns the (Gaussian)
    pushforward random variable; applied to a plain function it
    integrates by fixed-order Gauss-Legendre panels (exact Matérn
    shortcuts route through ``transforms/integrals_exact.py``).

    Examples
    --------
    >>> import linpde_gp_tpu as lgt
    >>> I = LebesgueIntegral(lgt.domains.asdomain([0.0, 1.0]))
    >>> round(float(I(lgt.functions.Polynomial([0.0, 2.0]))), 6)
    1.0
    >>> gp = lgt.GaussianProcess(
    ...     lgt.functions.Zero(()), lgt.kernels.Matern((), nu=1.5))
    >>> rv = I(gp)  # Gaussian pushforward of the prior
    >>> round(float(rv.std), 4)
    0.9314
    """

    def __init__(self, domain=None, codomain_shape=(), *, input_domain=None) -> None:
        if domain is None:
            domain = input_domain  # reference keyword (``input_domain=``)
        self._domain: Domain = asdomain(domain)
        super().__init__(
            (self._domain.shape, codomain_shape),
            codomain_shape,
        )
        if self.input_codomain_shape != ():
            raise NotImplementedError("Only scalar-codomain integrals.")

    @property
    def domain(self) -> Domain:
        return self._domain

    def discretization(self) -> Discretization:
        order = config.quadrature_order
        panels = config.quadrature_panels
        if isinstance(self._domain, Interval):
            nodes, weights = interval_quadrature(
                float(self._domain[0]), float(self._domain[1]), order, panels
            )
            return Discretization(
                jnp.asarray(nodes), jnp.asarray(weights)[None, :]
            )
        if isinstance(self._domain, (Box, CartesianProduct)):
            factor_nodes = []
            factor_weights = []
            for factor in self._domain.factors:
                if isinstance(factor, Interval):
                    n, w = interval_quadrature(
                        float(factor[0]), float(factor[1]), order, panels
                    )
                else:  # Point factor: measure zero — integral is zero.
                    n = np.asarray([float(np.asarray(factor))])
                    w = np.asarray([0.0])
                factor_nodes.append(n)
                factor_weights.append(w)
            mesh = np.stack(
                np.meshgrid(*factor_nodes, indexing="ij"), axis=-1
            ).reshape(-1, len(factor_nodes))
            wmesh = np.ones(())
            for w in factor_weights:
                wmesh = np.multiply.outer(wmesh, w)
            return Discretization(
                jnp.asarray(mesh), jnp.asarray(wmesh.reshape(1, -1))
            )
        raise NotImplementedError(
            f"No quadrature for domain type {type(self._domain).__name__}."
        )

    def __repr__(self):
        return f"LebesgueIntegral({self._domain!r})"
