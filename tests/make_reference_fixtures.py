"""Generate ``tests/fixtures/reference_parity.json``: posterior mean/std
of the five BASELINE configs computed by the INDEPENDENT dense oracle
(``reference_parity_oracle.py`` — hand-derived kernel calculus + naive
joint-Gram conditioning following the reference's conventions).

Run from the repo root:  python tests/make_reference_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reference_parity_oracle import (
    DenseOracle,
    IDENTITY,
    ProductKernel,
    expquad_derivs,
    heat_op,
    matern32_derivs,
    matern52_derivs,
    neg_laplacian,
)

NOISE = 1e-8  # shared explicit nugget: identical regularization on both sides


def config_poisson_1d():
    """1-D Poisson Dirichlet, ExpQuad prior (BASELINE config 1)."""
    k = ProductKernel(4.0, [expquad_derivs], [1.0])
    oracle = DenseOracle(k)
    X_pde = np.linspace(-1.0 + 0.2, 1.0 - 0.2, 8)
    oracle.observe(neg_laplacian(1), X_pde[:, None], np.full(8, 2.0), NOISE)
    X_bc = np.asarray([-1.0, 1.0])
    oracle.observe(IDENTITY, X_bc[:, None], np.asarray([0.0, 1.0]), NOISE)
    xq = np.linspace(-1.0, 1.0, 9)
    mean, std = oracle.posterior(xq[:, None])
    return dict(xq=xq.tolist(), mean=mean.tolist(), std=std.tolist())


def config_heat_1d():
    """1-D heat, space-time TensorProduct Matérn prior (config 2)."""
    k = ProductKernel(1.0, [matern32_derivs, matern52_derivs], [2.5, 2.0])
    oracle = DenseOracle(k)
    x_ic = np.linspace(-1.0 + 1e-6, 1.0 - 1e-6, 7)
    X_ic = np.stack([np.zeros(7), x_ic], -1)
    Y_ic = np.sin(np.pi * 0.5 * (x_ic + 1.0))  # first sine mode on [-1, 1]
    oracle.observe(IDENTITY, X_ic, Y_ic, NOISE)
    t_bc = np.linspace(0.0, 5.0, 6)
    for xb in (-1.0, 1.0):
        X_bc = np.stack([t_bc, np.full(6, xb)], -1)
        oracle.observe(IDENTITY, X_bc, np.zeros(6), NOISE)
    tg = np.linspace(0.0, 5.0, 8)
    xg = np.linspace(-1.0, 1.0, 5)
    X_pde = np.stack(np.meshgrid(tg, xg, indexing="ij"), -1).reshape(-1, 2)
    oracle.observe(heat_op(0.1), X_pde, np.zeros(40), NOISE)
    rng = np.random.default_rng(3)
    xq = np.stack([rng.uniform(0, 5, 12), rng.uniform(-1, 1, 12)], -1)
    mean, std = oracle.posterior(xq)
    return dict(xq=xq.tolist(), mean=mean.tolist(), std=std.tolist())


def config_poisson_2d():
    """2-D Poisson Dirichlet, product-Matérn(2.5) prior (config 3)."""
    k = ProductKernel(1.0, [matern52_derivs, matern52_derivs], [1.0, 1.0])
    oracle = DenseOracle(k)
    e = 1e-6
    s = np.linspace(-1.0 + e, 1.0 - e, 5)
    for edge in (
        np.stack([np.full(5, -1.0), s], -1),
        np.stack([np.full(5, 1.0), s], -1),
        np.stack([s, np.full(5, -1.0)], -1),
        np.stack([s, np.full(5, 1.0)], -1),
    ):
        oracle.observe(IDENTITY, edge, np.zeros(5), NOISE)
    g = np.linspace(-1.0, 1.0, 5)
    X_pde = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)
    # rhs f = 2 pi^2/4 sin(pi (x+1)/2) sin(pi (y+1)/2)-style source: use
    # the constant source of the library experiment for simplicity.
    oracle.observe(neg_laplacian(2), X_pde, np.full(25, 2.0), NOISE)
    rng = np.random.default_rng(4)
    xq = rng.uniform(-1, 1, (12, 2))
    mean, std = oracle.posterior(xq)
    return dict(xq=xq.tolist(), mean=mean.tolist(), std=std.tolist())


def config_poisson_fem():
    """Poisson with Galerkin (weak-form stiffness x L2-projection)
    observations (config 4).

    Observation functional: ``F[u] = A @ P[u]`` with ``A`` the
    (test x trial) P1 stiffness of ``-d^2/dx^2`` and ``P`` the
    mass-normalized L2 projection onto the trial hats.  In the oracle
    both are explicit: A is the exact hat-stiffness matrix and
    ``P[u] = M^{-1} \\int u phi`` with the integral by per-element
    Gauss-Legendre quadrature (the kernel is C^2 at worst; element-wise
    order-12 rules are ~1e-10 exact here).
    """
    num_elements = 5
    grid = np.linspace(-1.0, 1.0, num_elements + 2)
    h = grid[1] - grid[0]
    n_nodes = len(grid)

    def hat(j, x):
        left = grid[j - 1] if j > 0 else grid[0] - h
        right = grid[j + 1] if j < n_nodes - 1 else grid[-1] + h
        up = (x - left) / (grid[j] - left)
        down = (right - x) / (right - grid[j])
        return np.clip(np.minimum(up, down), 0.0, None)

    # Exact P1 matrices on the uniform grid.
    M = np.zeros((n_nodes, n_nodes))  # trial x trial mass
    for i in range(n_nodes):
        M[i, i] = 2.0 * h / 3.0
        if i > 0:
            M[i, i - 1] = M[i - 1, i] = h / 6.0
    M[0, 0] = M[-1, -1] = h / 3.0  # boundary half-hats
    A = np.zeros((n_nodes - 2, n_nodes))  # test(zero-bc) x trial stiffness
    for r, i in enumerate(range(1, n_nodes - 1)):
        A[r, i] = 2.0 / h
        A[r, i - 1] = A[r, i + 1] = -1.0 / h

    # Composite Gauss-Legendre per element (8 panels x 10 nodes): the
    # Matérn-3/2 integrand has a C^2 kink wherever a quadrature point of
    # one functional meets another's integration variable; the composite
    # rule keeps that error ~1e-9, inside the 1e-6 parity budget.
    gl_x, gl_w = np.polynomial.legendre.leggauss(10)
    qx, qw = [], []
    for a, b in zip(grid[:-1], grid[1:]):
        edges = np.linspace(a, b, 9)
        for aa, bb in zip(edges[:-1], edges[1:]):
            qx.append(0.5 * (bb - aa) * gl_x + 0.5 * (aa + bb))
            qw.append(0.5 * (bb - aa) * gl_w)
    qx = np.concatenate(qx)
    qw = np.concatenate(qw)
    Phi = np.stack([hat(j, qx) for j in range(n_nodes)])  # (nodes, nq)

    k = ProductKernel(1.0, [matern32_derivs], [1.0])

    from reference_parity_oracle import transformed_gram

    # Linear-functional "points": F[k(.)](y) = A M^{-1} \int k(x, y) phi(x) dx.
    W = np.linalg.solve(M, Phi * qw)  # (nodes, nq): projection weights
    G = A @ W  # (n_test, nq): Galerkin functional quadrature weights

    class GalerkinOracle(DenseOracle):
        def __init__(self):
            super().__init__(k)
            self.G = G
            self.qx = qx[:, None]

        def _block(self, L0, X0, L1, X1):
            def is_gal(L):
                return L == "galerkin"

            if is_gal(L0) and is_gal(L1):
                Kq = transformed_gram(self.k, IDENTITY, IDENTITY, self.qx, self.qx)
                return self.G @ Kq @ self.G.T
            if is_gal(L0):
                Kq = transformed_gram(self.k, IDENTITY, L1, self.qx, X1)
                return self.G @ Kq
            if is_gal(L1):
                Kq = transformed_gram(self.k, L0, IDENTITY, X0, self.qx)
                return Kq @ self.G.T
            return transformed_gram(self.k, L0, L1, X0, X1)

        def _system(self):
            K_blocks = []
            for (L0, X0, _, _, _) in self.batches:
                row = []
                for (L1, X1, _, _, _) in self.batches:
                    row.append(self._block(L0, X0, L1, X1))
                K_blocks.append(row)
            K = np.block(K_blocks)
            n_off = 0
            for (_, _, Y, C, _) in self.batches:
                K[n_off:n_off + len(Y), n_off:n_off + len(Y)] += C
                n_off += len(Y)
            resid = np.concatenate([Y - mu for (_, _, Y, _, mu) in self.batches])
            return K, resid

        def posterior(self, Xq, Lq=IDENTITY):
            K, resid = self._system()
            cho = scipy.linalg.cho_factor(K, lower=True)
            w = scipy.linalg.cho_solve(cho, resid)
            U = np.concatenate(
                [self._block(Lq, Xq, L1, X1) for (L1, X1, _, _, _) in self.batches],
                axis=1,
            )
            mean = U @ w
            V = scipy.linalg.cho_solve(cho, U.T)
            prior_var = np.diag(transformed_gram(self.k, Lq, Lq, Xq, Xq))
            var = prior_var - np.sum(U * V.T, axis=1)
            return mean, np.sqrt(np.maximum(var, 0.0))

    import scipy.linalg

    oracle = GalerkinOracle()
    X_bc = np.asarray([[-1.0], [1.0]])
    oracle.observe(IDENTITY, X_bc, np.asarray([0.0, 1.0]), NOISE)
    rhs_gal = 2.0 * (Phi[1:-1] * qw).sum(axis=1)  # int f psi_i, f = 2
    oracle.batches.append(
        ("galerkin", np.zeros((n_nodes - 2, 1)), rhs_gal,
         NOISE * np.eye(n_nodes - 2), np.zeros(n_nodes - 2))
    )
    xq = np.linspace(-1.0, 1.0, 9)
    mean, std = oracle.posterior(xq[:, None])
    return dict(xq=xq.tolist(), mean=mean.tolist(), std=std.tolist())


def config_poisson_inverse_rhs():
    """1-D Poisson inverse problem: joint u and f posteriors (config 5)."""
    mu_c, sig = 0.4, 0.3

    def u_true(x):
        return np.exp(-0.5 / sig**2 * (x - mu_c) ** 2)

    def f_true(x):
        return (1.0 - ((x - mu_c) / sig) ** 2) / sig**2 * u_true(x)

    k_u = ProductKernel(1.0, [expquad_derivs], [0.5])
    k_f = ProductKernel(100.0, [expquad_derivs], [0.25])

    from reference_parity_oracle import transformed_gram

    X_bc = np.asarray([[-1.0], [1.0]])
    Y_bc = u_true(X_bc[:, 0])
    X_meas = np.linspace(-1.0, 1.0, 12)[1:-1][:, None]
    Y_meas = u_true(X_meas[:, 0])
    meas_noise = 0.1**2

    oracle_u = DenseOracle(k_u)
    oracle_u.observe(IDENTITY, X_bc, Y_bc, NOISE)
    oracle_u.observe(IDENTITY, X_meas, Y_meas, meas_noise * np.eye(10))
    # PDE coupling at X_meas: 0 = -u''(X) - f(X); the f-prior is the
    # correlated "noise" of the -u'' observation.
    Kf_meas = transformed_gram(k_f, IDENTITY, IDENTITY, X_meas, X_meas)
    oracle_u.observe(
        neg_laplacian(1), X_meas, np.zeros(10), Kf_meas + NOISE * np.eye(10)
    )
    xq = np.linspace(-1.0, 1.0, 9)[:, None]
    u_mean, u_std = oracle_u.posterior(xq)

    # f posterior: condition f on  f(X_pde) ~ (-Lu)(X_pde)  where the
    # pushforward uses u | (bc, meas) only (matching the experiment).
    oracle_u2 = DenseOracle(k_u)
    oracle_u2.observe(IDENTITY, X_bc, Y_bc, NOISE)
    oracle_u2.observe(IDENTITY, X_meas, Y_meas, meas_noise * np.eye(10))
    X_pde = np.linspace(-1.0, 1.0, 10)[:, None]
    m_L, S_L = oracle_u2.pushforward(neg_laplacian(1), X_pde)
    oracle_f = DenseOracle(k_f)
    # Y = 0 = f(X) + b with b ~ N(-m_L, S_L)  =>  resid uses noise mean.
    oracle_f.observe(
        IDENTITY, X_pde, np.zeros(10), S_L + NOISE * np.eye(10),
        noise_mean=-m_L,
    )
    f_mean, f_std = oracle_f.posterior(xq)
    return dict(
        xq=xq[:, 0].tolist(),
        u_mean=u_mean.tolist(), u_std=u_std.tolist(),
        f_mean=f_mean.tolist(), f_std=f_std.tolist(),
    )


def main():
    fixtures = {
        "noise": NOISE,
        "poisson_1d": config_poisson_1d(),
        "heat_1d": config_heat_1d(),
        "poisson_2d": config_poisson_2d(),
        "poisson_fem": config_poisson_fem(),
        "poisson_inverse_rhs": config_poisson_inverse_rhs(),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "reference_parity.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(fixtures, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
