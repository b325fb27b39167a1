"""Shape-checked function layer.

Capability parity with the reference's dual-implementation ``JaxFunction``
(``functions/_jax.py:13``) and ``pn.functions.Function`` — but with a
SINGLE evaluation path: every function is a pure jnp computation that runs
eagerly, under ``jit``, and under ``vmap``/``jvp`` (the autodiff fallback
for differential operators).  There is no separate numpy path to keep in
sync.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...utils.shapes import ShapeType, as_shape


class Function:
    """Callable with declared ``input_shape`` and ``output_shape``.

    ``__call__`` is batched: for input of shape ``batch + input_shape`` it
    returns ``batch + output_shape``.  Subclasses implement ``_evaluate``
    with exactly these semantics, in jnp.
    """

    def __init__(self, input_shape, output_shape=()) -> None:
        self._input_shape: ShapeType = as_shape(input_shape)
        self._output_shape: ShapeType = as_shape(output_shape)

    @property
    def input_shape(self) -> ShapeType:
        return self._input_shape

    @property
    def input_ndim(self) -> int:
        return len(self._input_shape)

    @property
    def output_shape(self) -> ShapeType:
        return self._output_shape

    @property
    def output_ndim(self) -> int:
        return len(self._output_shape)

    def __call__(self, x):
        x = jnp.asarray(x)
        batch_ndim = x.ndim - self.input_ndim
        if batch_ndim < 0 or x.shape[batch_ndim:] != self._input_shape:
            raise ValueError(
                f"Input of shape {x.shape} is not compatible with "
                f"input_shape {self._input_shape}."
            )
        out = self._evaluate(x)
        expected = x.shape[:batch_ndim] + self._output_shape
        if out.shape != expected:
            out = jnp.reshape(out, expected)
        return out

    def _evaluate(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # -- scalar-point evaluation (used by autodiff-based operators) -------
    def _evaluate_point(self, x: jnp.ndarray) -> jnp.ndarray:
        """Evaluate at a single un-batched point of shape ``input_shape``."""
        return self._evaluate(x)

    # -- arithmetic -------------------------------------------------------
    def __add__(self, other):
        from .arithmetic import SumFunction, asfunction

        if isinstance(other, (int, float, np.ndarray, jnp.ndarray)) or np.isscalar(
            other
        ):
            from .basic import Constant

            other = Constant(self.input_shape, other, output_shape=self.output_shape)
        if isinstance(other, Zero):
            return self
        if isinstance(self, Zero):
            return other
        return SumFunction(self, asfunction(other, self.input_shape))

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        return self.__add__(-other if isinstance(other, Function) else -1.0 * other)

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __neg__(self):
        return -1.0 * self

    def __mul__(self, scalar):
        if np.ndim(scalar) == 0:
            from .arithmetic import ScaledFunction

            return ScaledFunction(self, scalar)
        return NotImplemented

    def __rmul__(self, scalar):
        return self.__mul__(scalar)

    def __truediv__(self, scalar):
        return self.__mul__(1.0 / scalar)


class LambdaFunction(Function):
    """Wrap a jnp-traceable callable (reference:
    ``pn.functions.LambdaFunction`` / ``functions/_jax.py:61``)."""

    def __init__(self, fn, input_shape, output_shape=(), vectorized: bool = True):
        super().__init__(input_shape, output_shape)
        self._fn = fn
        self._vectorized = vectorized

    def _evaluate(self, x):
        if self._vectorized:
            return jnp.asarray(self._fn(x))
        import jax

        batch_ndim = x.ndim - self.input_ndim
        fn = self._fn
        for _ in range(batch_ndim):
            fn = jax.vmap(fn)
        return jnp.asarray(fn(x))


class Zero(Function):
    """The zero function (reference: ``functions/_constant.py:52``)."""

    def _evaluate(self, x):
        batch_shape = x.shape[: x.ndim - self.input_ndim]
        return jnp.zeros(batch_shape + self.output_shape, dtype=x.dtype)

    def __rmul__(self, scalar):
        return self

    def __mul__(self, scalar):
        if np.ndim(scalar) == 0:
            return self
        return NotImplemented
