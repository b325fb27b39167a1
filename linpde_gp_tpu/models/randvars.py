"""Gaussian random variables.

Subsumes the probnum ``Normal``/``Constant``/``asrandvar`` surface the
reference consumes (SURVEY.md L1) plus the reference's own
``condition_normal_on_observations`` (``randvars/_normal.py:8-69``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..ops.linalg.chol import cho_solve, cholesky, solve_triangular
from ..ops.linalg.covariance import Covariance
from ..utils.shapes import as_shape, size


class RandomVariable:
    pass


class Constant(RandomVariable):
    """Deterministic value as a degenerate random variable."""

    def __init__(self, value):
        self._value = jnp.asarray(value)

    @property
    def value(self):
        return self._value

    @property
    def shape(self):
        return self._value.shape

    @property
    def mean(self):
        return self._value

    @property
    def cov(self) -> Covariance:
        flat = self._value.reshape(-1)
        zero = jnp.zeros((flat.shape[0], flat.shape[0]), self._value.dtype)
        return Covariance(zero, self.shape, self.shape)

    @property
    def std(self):
        return jnp.zeros_like(self._value)

    def __neg__(self):
        return Constant(-self._value)


class Normal(RandomVariable):
    """Multivariate normal with a ``Covariance``-view second moment.

    Examples
    --------
    >>> import numpy as np, jax.numpy as jnp
    >>> rv = Normal(jnp.zeros(2), 2.0 * jnp.eye(2))
    >>> rv.shape
    (2,)
    >>> post = rv.condition_on_observations(
    ...     jnp.asarray([1.0]), transform=jnp.asarray([[1.0, 0.0]]))
    >>> np.round(np.asarray(post.mean), 4)
    array([1., 0.])
    """

    def __init__(self, mean, cov):
        self._mean = jnp.asarray(mean)
        if isinstance(cov, Covariance):
            self._cov = cov
        else:
            cov = jnp.asarray(cov)
            if cov.ndim == 1:
                cov = jnp.diag(cov)
            self._cov = Covariance(cov, self._mean.shape, self._mean.shape)

    @property
    def shape(self):
        return self._mean.shape

    @property
    def size(self) -> int:
        return int(self._mean.size)

    @property
    def mean(self):
        return self._mean

    @property
    def cov(self) -> Covariance:
        return self._cov

    @property
    def cov_matrix(self) -> jnp.ndarray:
        return self._cov.matrix

    @property
    def var(self):
        return jnp.diagonal(self._cov.matrix).reshape(self.shape)

    @property
    def std(self):
        # Posterior variances can round to tiny negatives.
        return jnp.sqrt(jnp.maximum(self.var, 0.0))

    def sample(self, key, sample_shape=()):
        sample_shape = as_shape(sample_shape)
        n = self.size
        chol = cholesky(self._cov.matrix)
        eps = jax.random.normal(
            key, sample_shape + (n,), dtype=self._mean.dtype
        )
        flat = self._mean.reshape(-1) + eps @ chol.T
        return flat.reshape(sample_shape + self.shape)

    # -- arithmetic ------------------------------------------------------
    def __neg__(self):
        return Normal(-self._mean, self._cov)

    def __add__(self, other):
        if isinstance(other, Normal):
            return Normal(self._mean + other.mean, self._cov + other.cov)
        if isinstance(other, Constant):
            return Normal(self._mean + other.value, self._cov)
        return Normal(self._mean + jnp.asarray(other), self._cov)

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-other)

    def __mul__(self, scalar):
        if np.ndim(scalar) == 0:
            return Normal(scalar * self._mean, (scalar**2) * self._cov)
        return NotImplemented

    __rmul__ = __mul__

    def condition_on_observations(self, observations, transform=None, noise=None):
        """Finite-dimensional Gaussian conditioning (reference:
        ``randvars/_normal.py:8-69``).

        ``transform`` is the observation matrix ``A`` in ``y = A x + b``;
        ``noise`` an optional ``Normal``/``Constant``.
        """
        y = jnp.asarray(observations).reshape(-1)
        mean = self._mean.reshape(-1)
        cov = self._cov.matrix
        if transform is None:
            A = jnp.eye(mean.shape[0], dtype=mean.dtype)
        else:
            from ..ops.linalg.linops import aslinop

            A = aslinop(transform).todense()
        pred_mean = A @ mean
        crosscov = cov @ A.T
        gram = A @ crosscov
        if noise is not None:
            pred_mean = pred_mean + noise.mean.reshape(-1)
            gram = gram + noise.cov.matrix
        chol = cholesky(gram)
        resid = y - pred_mean
        new_mean = mean + crosscov @ cho_solve(chol, resid)
        half = solve_triangular(chol, crosscov.T)
        new_cov = cov - half.T @ half
        return Normal(
            new_mean.reshape(self.shape),
            Covariance(new_cov, self.shape, self.shape),
        )


def asrandvar(obj) -> RandomVariable:
    if isinstance(obj, RandomVariable):
        return obj
    if isinstance(obj, (int, float, np.ndarray, jnp.ndarray)) or np.isscalar(obj):
        return Constant(jnp.asarray(obj))
    raise TypeError(f"Cannot interpret {obj!r} as a RandomVariable.")
