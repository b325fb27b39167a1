"""Multi-output covariance functions.

Parity: reference ``covfuncs/_independent_multi_output.py:11`` and
``covfuncs/_stack.py:14``.  Used for multi-field models such as the CPU
thermal case study's ``(u, q̇_V, q̇_A)`` prior (``experiments/cpu.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import CovarianceFunction


class IndependentMultiOutputCovarianceFunction(CovarianceFunction):
    """Diagonal multi-output kernel: ``k[i, j] = delta_ij k_i``."""

    def __init__(self, *covfuncs: CovarianceFunction):
        covfuncs = tuple(covfuncs)
        input_shape = covfuncs[0].input_shape
        if not all(
            k.input_shape == input_shape
            and k.output_shape_0 == ()
            and k.output_shape_1 == ()
            for k in covfuncs
        ):
            raise ValueError(
                "All component kernels must be scalar-output with a common "
                "input shape."
            )
        self._covfuncs = covfuncs
        m = len(covfuncs)
        super().__init__(input_shape, (m,), (m,))

    @property
    def covfuncs(self):
        return self._covfuncs

    def _evaluate(self, x0, x1):
        batch = jnp.broadcast_shapes(
            x0.shape[: x0.ndim - self.input_ndim],
            x1.shape[: x1.ndim - self.input_ndim],
        )
        m = len(self._covfuncs)
        out = jnp.zeros(batch + (m, m), dtype=jnp.result_type(x0, x1))
        for i, k in enumerate(self._covfuncs):
            out = out.at[..., i, i].set(k._evaluate(x0, x1))
        return out

    def matrix(self, X0, X1=None):
        # Block-diagonal Gram (output-dims-first flattening), reference
        # ``_independent_multi_output.py:66-70``.
        blocks = [k.matrix(X0, X1) for k in self._covfuncs]
        from ..linalg.linops import BlockDiagonal, Dense

        return BlockDiagonal([Dense(b) for b in blocks]).todense()

    def linop(self, X0, X1=None):
        from ..linalg.linops import BlockDiagonal, Dense

        return BlockDiagonal([Dense(k.matrix(X0, X1)) for k in self._covfuncs])


class StackCovarianceFunction(CovarianceFunction):
    """Stack scalar-output kernels along one output slot
    (reference: ``covfuncs/_stack.py:14``)."""

    def __init__(self, *covfuncs: CovarianceFunction, stack_argnum: int = 0):
        covfuncs = tuple(covfuncs)
        input_shape = covfuncs[0].input_shape
        if not all(
            k.input_shape == input_shape
            and k.output_shape_0 == ()
            and k.output_shape_1 == ()
            for k in covfuncs
        ):
            raise ValueError("All stacked kernels must be scalar-output.")
        self._covfuncs = covfuncs
        self._stack_argnum = stack_argnum
        m = len(covfuncs)
        out0 = (m,) if stack_argnum == 0 else ()
        out1 = (m,) if stack_argnum == 1 else ()
        super().__init__(input_shape, out0, out1)

    @property
    def covfuncs(self):
        return self._covfuncs

    @property
    def stack_argnum(self) -> int:
        return self._stack_argnum

    def _evaluate(self, x0, x1):
        vals = [k._evaluate(x0, x1) for k in self._covfuncs]
        return jnp.stack(vals, axis=-1)

    def matrix(self, X0, X1=None):
        blocks = [k.matrix(X0, X1) for k in self._covfuncs]
        axis = 0 if self._stack_argnum == 0 else 1
        return jnp.concatenate(blocks, axis=axis)
