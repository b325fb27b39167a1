"""Covariance "views": simultaneous tensor and matrix representations of a
covariance between two multi-dimensional quantities.

Capability parity with the reference's ``linpde_gp.randvars.Covariance``
(``randvars/_covariance.py:13-248``): a covariance with ``shape0`` /
``shape1`` can be viewed either as an array of shape ``shape0 + shape1``
or as a flattened 2-D matrix (C-order flatten contract).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils.shapes import ShapeType, as_shape, size


class Covariance:
    """Dense covariance block with tensor and matrix views."""

    def __init__(self, array: jnp.ndarray, shape0, shape1) -> None:
        self._shape0: ShapeType = as_shape(shape0)
        self._shape1: ShapeType = as_shape(shape1)
        array = jnp.asarray(array)
        expected = self._shape0 + self._shape1
        if array.shape == expected:
            self._array = array
        elif array.shape == (size(self._shape0), size(self._shape1)):
            self._array = array.reshape(expected)
        else:
            raise ValueError(
                f"Covariance array of shape {array.shape} does not match "
                f"shape0={self._shape0}, shape1={self._shape1}."
            )

    @property
    def shape0(self) -> ShapeType:
        return self._shape0

    @property
    def shape1(self) -> ShapeType:
        return self._shape1

    @property
    def size0(self) -> int:
        return size(self._shape0)

    @property
    def size1(self) -> int:
        return size(self._shape1)

    @property
    def array(self) -> jnp.ndarray:
        """Tensor view of shape ``shape0 + shape1``."""
        return self._array

    @property
    def matrix(self) -> jnp.ndarray:
        """Flattened 2-D view (C-order, matching the reference contract at
        ``randvars/_covariance.py:118-135``)."""
        return self._array.reshape(self.size0, self.size1)

    @property
    def linop(self):
        """Structured-operator view (reference ``Covariance.linop``)."""
        from .linops import Dense

        return Dense(self.matrix)

    @property
    def T(self) -> "Covariance":
        mat = self.matrix.T.reshape(self._shape1 + self._shape0)
        return Covariance(mat, self._shape1, self._shape0)

    def __add__(self, other):
        if isinstance(other, Covariance):
            return Covariance(self._array + other.array, self._shape0, self._shape1)
        return Covariance(self._array + jnp.asarray(other), self._shape0, self._shape1)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, Covariance):
            other = other.array
        return Covariance(self._array - jnp.asarray(other), self._shape0, self._shape1)

    def __mul__(self, scalar):
        return Covariance(self._array * scalar, self._shape0, self._shape1)

    __rmul__ = __mul__

    def __neg__(self):
        return Covariance(-self._array, self._shape0, self._shape1)
