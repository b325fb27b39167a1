"""Gram-free iterative GP conditioning.

Beyond-reference scale capability: at N ≳ 5·10^4 the dense Gram
(O(N²) HBM) no longer fits on a chip.  This solver never materializes
it — representer weights are computed by conjugate gradients where each
Gram matvec streams through the tiled Pallas reduction
(``ops/pallas_gram.pallas_gram_matvec``): O(N²) compute, O(N) memory.
This is the TPU-native analogue of the reference's KeOps strategy
("O(N²) compute without O(N²) memory", SURVEY.md §5) applied to the
full solve, not just assembly.

Posterior variance solves ``K^{-1} k(x_q)`` per query block with the
same matvec (batched CG via ``vmap``), so it is exact up to the CG
tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas_gram import gram_matrix, gram_matvec, kernel_term_specs
from ..ops.transforms.dispatch import apply_operator_to_kernel
from .functions.base import Function, Zero
from .gp import GaussianProcess


class IterativeGPRegressor:
    """Condition a scalar GP on one combined operator-observation set,
    gram-free.

    Parameters
    ----------
    prior:
        Scalar-output :class:`GaussianProcess`.
    X:
        ``(n,) + input_shape`` collocation points.
    Y:
        ``(n,)`` observations of ``L u (x_i) + eps``.
    L:
        Optional linear differential operator applied to ``u`` at ``X``.
    noise_variance:
        Homoscedastic observation noise (also the regularizer; must be
        positive for CG conditioning of smooth-kernel Grams).
    """

    def __init__(
        self,
        prior: GaussianProcess,
        X,
        Y,
        *,
        L=None,
        noise_variance: float = 1e-6,
        tol: float = 1e-6,
        maxiter: int = 512,
    ):
        if prior.output_shape != ():
            raise ValueError("IterativeGPRegressor supports scalar outputs.")
        self.prior = prior
        self.X = jnp.asarray(X).reshape((-1,) + prior.input_shape)
        self.Y = jnp.asarray(Y).reshape(-1)
        self.noise_variance = float(noise_variance)
        self.tol = float(tol)
        self.maxiter = int(maxiter)

        k = prior.cov
        if L is not None:
            k_obs = apply_operator_to_kernel(
                L, apply_operator_to_kernel(L, k, argnum=1), argnum=0
            )
            k_cross = apply_operator_to_kernel(L, k, argnum=1)
            mean_obs = L(prior.mean) if not isinstance(prior.mean, Zero) else prior.mean
        else:
            k_obs = k
            k_cross = k
            mean_obs = prior.mean
        self._k_obs = k_obs
        self._k_cross = k_cross
        self._mean_obs = mean_obs

        self._obs_spec = kernel_term_specs(k_obs)
        self._cross_spec = kernel_term_specs(k_cross)

        self._weights = None

    # ------------------------------------------------------------------
    def _gram_matvec(self, v: jnp.ndarray) -> jnp.ndarray:
        x = self.X.reshape(self.X.shape[0], -1)
        if self._obs_spec is not None:
            out = gram_matvec(self._obs_spec, x, x, v)
        else:
            out = gram_matrix(self._k_obs, self.X) @ v
        return out + self.noise_variance * v

    @property
    def representer_weights(self) -> jnp.ndarray:
        if self._weights is None:
            resid = self.Y - self._mean_obs(self.X).reshape(-1)
            w, _ = jax.scipy.sparse.linalg.cg(
                self._gram_matvec,
                resid,
                tol=self.tol,
                maxiter=self.maxiter,
            )
            self._weights = w
        return self._weights

    # ------------------------------------------------------------------
    def mean(self, x) -> jnp.ndarray:
        x = jnp.asarray(x)
        batch = x.shape[: x.ndim - len(self.prior.input_shape)]
        xq = x.reshape((-1,) + self.prior.input_shape)
        w = self.representer_weights
        if self._cross_spec is not None:
            update = gram_matvec(
                self._cross_spec,
                xq.reshape(xq.shape[0], -1),
                self.X.reshape(self.X.shape[0], -1),
                w,
            )
        else:
            update = gram_matrix(self._k_cross, xq, self.X) @ w
        m = self.prior.mean(xq).reshape(-1)
        return (m + update).reshape(batch)

    def var(self, x, *, block_size: int = 256) -> jnp.ndarray:
        """Posterior variance by batched CG (exact up to tolerance)."""
        x = jnp.asarray(x)
        batch = x.shape[: x.ndim - len(self.prior.input_shape)]
        xq = x.reshape((-1,) + self.prior.input_shape)
        kxX = gram_matrix(self._k_cross, xq, self.X)  # (nq, n)

        def solve_one(rhs):
            sol, _ = jax.scipy.sparse.linalg.cg(
                self._gram_matvec, rhs, tol=self.tol, maxiter=self.maxiter
            )
            return sol

        sols = jax.lax.map(
            solve_one, kxX, batch_size=min(block_size, kxX.shape[0])
        )
        prior_var = self.prior.cov(xq)
        update = jnp.sum(kxX * sols, axis=-1)
        return jnp.maximum(prior_var - update, 0.0).reshape(batch)

    def std(self, x, **kw) -> jnp.ndarray:
        return jnp.sqrt(self.var(x, **kw))
