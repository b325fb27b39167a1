"""Independent dense-f64 oracle for the five BASELINE parity configs.

Mirrors the REFERENCE's conventions (kernel formulas and conditioning
math) without using the library's transform engine: univariate kernel
derivatives are hand-derived closed forms (textbook Matérn/ExpQuad
calculus, NOT the library's rational recurrences), operators act on
product kernels through an explicit product-rule expansion, and
conditioning is one dense joint Gram + ``scipy`` Cholesky (the
naive-GP-oracle pattern of the reference's own
``tests/linpde_gp/randprocs/test_posterior_gp.py:183-220``).

Kernel conventions (reference ``probnum`` precision conventions):
ExpQuad ``exp(-0.5 ||(x0-x1)/l||^2)``; Matérn scaled distance
``t = sqrt(2 nu) |x0-x1| / l`` with the half-integer closed forms.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg


# -- univariate kernels: value and d/d(d) derivatives, d = x0 - x1 ----------
#
# Each returns g^{(m)}(d) for m = 0..max_order.  Derivations (by hand):
#   Matérn 3/2: g = (1+t)e^{-t}, t = c|d|, c = sqrt(3)/l
#     g'   = -c^2 d e^{-t}
#     g''  = c^2 (t - 1) e^{-t}
#   Matérn 5/2: g = (1+t+t^2/3)e^{-t}, c = sqrt(5)/l
#     g'   = -(c^2 d / 3)(1 + t) e^{-t}
#     g''  = -(c^2/3)(1 + t - t^2) e^{-t}
#     g''' = -(c^4 d/3)(t - 3) e^{-t}
#     g''''= -(c^4/3)(5t - 3 - t^2) e^{-t}
#   ExpQuad: g = e^{-d^2/(2 l^2)}
#     g'   = -(d/l^2) g
#     g''  = (d^2/l^4 - 1/l^2) g
#     g''' = (3d/l^4 - d^3/l^6) g
#     g''''= (3/l^4 - 6 d^2/l^6 + d^4/l^8) g


def matern32_derivs(d, ls):
    c = np.sqrt(3.0) / ls
    t = c * np.abs(d)
    e = np.exp(-t)
    return [
        (1.0 + t) * e,
        -(c**2) * d * e,
        (c**2) * (t - 1.0) * e,
    ]


def matern52_derivs(d, ls):
    c = np.sqrt(5.0) / ls
    t = c * np.abs(d)
    e = np.exp(-t)
    return [
        (1.0 + t + t * t / 3.0) * e,
        -(c**2 * d / 3.0) * (1.0 + t) * e,
        -(c**2 / 3.0) * (1.0 + t - t * t) * e,
        -(c**4 * d / 3.0) * (t - 3.0) * e,
        -(c**4 / 3.0) * (5.0 * t - 3.0 - t * t) * e,
    ]


def expquad_derivs(d, ls):
    l2 = ls * ls
    g = np.exp(-0.5 * d * d / l2)
    return [
        g,
        -(d / l2) * g,
        (d * d / l2**2 - 1.0 / l2) * g,
        (3.0 * d / l2**2 - d**3 / l2**3) * g,
        (3.0 / l2**2 - 6.0 * d * d / l2**3 + d**4 / l2**4) * g,
    ]


class ProductKernel:
    """``k(x0, x1) = variance * prod_i g_i(x0_i - x1_i)``."""

    def __init__(self, variance, factor_derivs, lengthscales):
        self.variance = float(variance)
        self.factor_derivs = list(factor_derivs)
        self.ls = list(lengthscales)
        self.ndim = len(self.factor_derivs)

    def derivs(self, i, d):
        return self.factor_derivs[i](d, self.ls[i])


# Operators as sums of per-dimension derivative multi-orders:
#   [(coeff, orders)] with orders a tuple of per-dim derivative counts.
IDENTITY = ((1.0, None),)


def neg_laplacian(ndim):
    terms = []
    for i in range(ndim):
        o = [0] * ndim
        o[i] = 2
        terms.append((-1.0, tuple(o)))
    return tuple(terms)


def heat_op(alpha):
    # d/dt - alpha * d^2/dx^2 on (t, x).
    return ((1.0, (1, 0)), (-alpha, (0, 2)))


def transformed_gram(kernel: ProductKernel, L0, L1, X0, X1):
    """``(L0 (x0) L1) k`` evaluated on the point grids (n0, n1).

    ``partial^a_{x0} partial^b_{x1} g(x0 - x1) = (-1)^b g^{(a+b)}(d)``.
    """
    X0 = np.atleast_2d(np.asarray(X0, np.float64).reshape(X0.shape[0], -1))
    X1 = np.atleast_2d(np.asarray(X1, np.float64).reshape(X1.shape[0], -1))
    ndim = kernel.ndim
    out = np.zeros((X0.shape[0], X1.shape[0]))
    D = [X0[:, None, i] - X1[None, :, i] for i in range(ndim)]
    deriv_cache = {}

    def g(i, m):
        if (i, m) not in deriv_cache:
            allm = kernel.derivs(i, D[i])
            for mm, val in enumerate(allm):
                deriv_cache[(i, mm)] = val
        return deriv_cache[(i, m)]

    for c0, o0 in L0:
        for c1, o1 in L1:
            a = o0 if o0 is not None else (0,) * ndim
            b = o1 if o1 is not None else (0,) * ndim
            term = np.ones_like(out)
            sign = 1.0
            for i in range(ndim):
                sign *= (-1.0) ** b[i]
                term = term * g(i, a[i] + b[i])
            out += c0 * c1 * sign * term
    return kernel.variance * out


class DenseOracle:
    """Joint dense conditioning over heterogeneous observation batches."""

    def __init__(self, kernel: ProductKernel):
        self.k = kernel
        self.batches = []  # (L, X, Y, noise_cov, noise_mean)

    def observe(self, L, X, Y, noise_cov, noise_mean=None):
        X = np.asarray(X, np.float64).reshape(len(np.atleast_1d(Y)), -1)
        Y = np.asarray(Y, np.float64).reshape(-1)
        noise_cov = np.asarray(noise_cov, np.float64)
        if noise_cov.ndim == 0:
            noise_cov = float(noise_cov) * np.eye(len(Y))
        self.batches.append(
            (L, X, Y,
             noise_cov,
             np.zeros(len(Y)) if noise_mean is None else np.asarray(noise_mean))
        )

    def _system(self):
        K_blocks = []
        for (L0, X0, _, C0, _) in self.batches:
            row = []
            for (L1, X1, _, _, _) in self.batches:
                row.append(transformed_gram(self.k, L0, L1, X0, X1))
            K_blocks.append(row)
        K = np.block(K_blocks)
        n_off = 0
        for (_, _, Y, C, _) in self.batches:
            K[n_off:n_off + len(Y), n_off:n_off + len(Y)] += C
            n_off += len(Y)
        resid = np.concatenate([Y - mu for (_, _, Y, _, mu) in self.batches])
        return K, resid

    def posterior(self, Xq, Lq=IDENTITY):
        """Posterior mean and std of ``Lq u`` at ``Xq``."""
        K, resid = self._system()
        cho = scipy.linalg.cho_factor(K, lower=True)
        w = scipy.linalg.cho_solve(cho, resid)
        Xq = np.asarray(Xq, np.float64).reshape(np.asarray(Xq).shape[0], -1)
        U = np.concatenate(
            [
                transformed_gram(self.k, Lq, L1, Xq, X1)
                for (L1, X1, _, _, _) in self.batches
            ],
            axis=1,
        )
        mean = U @ w
        V = scipy.linalg.cho_solve(cho, U.T)
        prior_var = np.diag(transformed_gram(self.k, Lq, Lq, Xq, Xq))
        var = prior_var - np.sum(U * V.T, axis=1)
        return mean, np.sqrt(np.maximum(var, 0.0))

    def pushforward(self, L, X):
        """Posterior mean and COVARIANCE of ``L u (X)`` (for the inverse
        problem's PDE coupling)."""
        K, resid = self._system()
        cho = scipy.linalg.cho_factor(K, lower=True)
        w = scipy.linalg.cho_solve(cho, resid)
        X = np.asarray(X, np.float64).reshape(np.asarray(X).shape[0], -1)
        U = np.concatenate(
            [
                transformed_gram(self.k, L, L1, X, X1)
                for (L1, X1, _, _, _) in self.batches
            ],
            axis=1,
        )
        mean = U @ w
        V = scipy.linalg.cho_solve(cho, U.T)
        cov = transformed_gram(self.k, L, L, X, X) - U @ V
        return mean, 0.5 * (cov + cov.T)
