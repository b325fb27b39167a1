"""Univariate P1 finite-element ("hat function") basis.

Capability parity with the reference's
``UnivariateLinearInterpolationBasis`` (``functions/bases/_fem.py:7``):
a multi-output function whose components are the piecewise-linear nodal
basis functions on a 1-D grid, plus element-support queries used by the
L2-projection and weak-form assemblers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Function


class UnivariateLinearInterpolationBasis(Function):
    def __init__(self, grid, zero_boundary: bool = False) -> None:
        grid = np.asarray(grid, dtype=np.float64)
        zero_boundary = bool(zero_boundary)

        if grid.ndim != 1 or grid.size < 3:
            raise ValueError("`grid` must be 1-D with at least 3 points.")

        if not zero_boundary:
            # Sentinel points so boundary hats keep unit height.
            self._grid = np.concatenate(
                (
                    [grid[0] - (grid[1] - grid[0])],
                    grid,
                    [grid[-1] + (grid[-1] - grid[-2])],
                )
            )
        else:
            self._grid = grid

        self._zero_boundary = zero_boundary
        self._left_scale = 1.0 / (self.x_i - self.x_im1)
        self._right_scale = 1.0 / (self.x_ip1 - self.x_i)

        super().__init__((), (self._grid.size - 2,))

    @property
    def grid(self) -> np.ndarray:
        return self._grid

    @property
    def x_im1(self) -> np.ndarray:
        return self._grid[:-2]

    @property
    def x_i(self) -> np.ndarray:
        return self._grid[1:-1]

    @property
    def x_ip1(self) -> np.ndarray:
        return self._grid[2:]

    @property
    def zero_boundary(self) -> bool:
        return self._zero_boundary

    def __len__(self) -> int:
        return self.output_shape[0]

    def _evaluate(self, x):
        xe = x[..., None]
        res = jnp.maximum(
            0.0,
            jnp.where(
                xe < self.x_i,
                (xe - self.x_im1) * self._left_scale,
                (self.x_ip1 - xe) * self._right_scale,
            ),
        )
        if not self._zero_boundary:
            # Clamp the flat extensions of the boundary hats to zero.
            left_mask = (x < self._grid[1])[..., None]
            right_mask = (x > self._grid[-2])[..., None]
            first = jnp.zeros((len(self),), bool).at[0].set(True)
            last = jnp.zeros((len(self),), bool).at[-1].set(True)
            res = jnp.where(left_mask & first, 0.0, res)
            res = jnp.where(right_mask & last, 0.0, res)
        return res

    def eval_elem(self, idx: int, x):
        x = jnp.asarray(x)
        res = jnp.maximum(
            0.0,
            jnp.where(
                x < self.x_i[idx],
                (x - self.x_im1[idx]) * self._left_scale[idx],
                (self.x_ip1[idx] - x) * self._right_scale[idx],
            ),
        )
        if not self._zero_boundary:
            if idx in (0, -len(self)):
                res = jnp.where(x < self._grid[1], 0.0, res)
            if idx in (len(self) - 1, -1):
                res = jnp.where(x > self._grid[-2], 0.0, res)
        return res

    def support_bounds(self, idx: int):
        assert -len(self) <= idx < len(self)
        if not self._zero_boundary:
            if idx in (0, -len(self)):
                return self.x_i[0], self.x_ip1[0]
            if idx in (len(self) - 1, -1):
                return self.x_im1[-1], self.x_i[-1]
        return self.x_im1[idx], self.x_ip1[idx]

    def l2_projection(self, normalized: bool = True):
        from ...ops.functionals.projections import L2Projection_UnivariateLinearInterpolationBasis

        return L2Projection_UnivariateLinearInterpolationBasis(
            self, normalized=normalized
        )
