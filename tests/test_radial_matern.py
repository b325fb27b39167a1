"""Isotropic multivariate Matérn diffop closed forms vs autodiff oracle
(parity with the reference's multivariate ``HalfIntegerMatern_*`` families,
``covfuncs/linfuncops/diffops/_matern.py:17,138``)."""

import numpy as np
import pytest

import linpde_gp_tpu as lgt
from linpde_gp_tpu.ops import diffops
from linpde_gp_tpu.ops.transforms import (
    AutodiffTransformedKernel,
    apply_operator_to_kernel,
    as_coefficients,
)
from linpde_gp_tpu.ops.transforms.radial import RadialMaternDerivativeKernel

rng = np.random.default_rng(3)


def _ops(d):
    return {
        "DD": (diffops.DirectionalDerivative(rng.uniform(-1, 1, (d,))), 1),
        "WL": (diffops.WeightedLaplacian(rng.uniform(0.5, 2, (d,))), 2),
        "Lap": (diffops.Laplacian((d,)), 2),
    }


@pytest.mark.parametrize("nu", [1.5, 2.5, 3.5])
@pytest.mark.parametrize("d", [2, 3])
def test_radial_matern_matrix(nu, d):
    shape = (d,)
    k = lgt.kernels.Matern(shape, nu=nu, lengthscales=rng.uniform(0.5, 1.5, shape))
    ops = _ops(d)
    cases = [("id", None, 0)] + [(n, op, o) for n, (op, o) in ops.items()]
    for name0, L0, o0 in cases:
        for name1, L1, o1 in cases:
            if L0 is None and L1 is None:
                continue
            if o0 + o1 > 2 * int(nu):
                continue
            kk = k
            if L1 is not None:
                kk = apply_operator_to_kernel(L1, kk, argnum=1)
            if L0 is not None:
                kk = apply_operator_to_kernel(L0, kk, argnum=0)
            assert isinstance(kk, RadialMaternDerivativeKernel), (
                name0,
                name1,
                type(kk),
            )
            oracle = AutodiffTransformedKernel(
                k,
                None if L0 is None else as_coefficients(L0),
                None if L1 is None else as_coefficients(L1),
            )
            x0 = rng.uniform(-1, 1, (6,) + shape)
            x1 = rng.uniform(-1, 1, (5,) + shape)
            np.testing.assert_allclose(
                np.asarray(kk(x0[:, None], x1[None, :])),
                np.asarray(oracle(x0[:, None], x1[None, :])),
                atol=1e-10,
                err_msg=f"{name0}/{name1}",
            )
            # Diagonal must be finite (autodiff through sqrt would NaN).
            diag = np.asarray(kk(x0, x0))
            assert np.all(np.isfinite(diag)), (name0, name1)


def test_radial_diagonal_exact_value():
    """Var[∂_i u] for isotropic Matérn nu=2.5, unit lengthscale is
    c^2/3 per the 1-D result (radial and product paths must agree)."""
    k2 = lgt.kernels.Matern((2,), nu=2.5, lengthscales=1.0)
    e0 = np.zeros(2)
    e0[0] = 1.0
    D = diffops.DirectionalDerivative(e0)
    kk = apply_operator_to_kernel(
        D, apply_operator_to_kernel(D, k2, argnum=1), argnum=0
    )
    val = float(kk(np.zeros(2), np.zeros(2)))
    np.testing.assert_allclose(val, (2 * 2.5) / 3.0, rtol=1e-12)


def test_radial_gram_is_positive_definite():
    k = lgt.kernels.Matern((2,), nu=2.5, lengthscales=0.8)
    L = diffops.Laplacian((2,))
    kk = apply_operator_to_kernel(
        L, apply_operator_to_kernel(L, k, argnum=1), argnum=0
    )
    X = rng.uniform(-1, 1, (25, 2))
    G = np.asarray(kk.matrix(X))
    np.testing.assert_allclose(G, G.T, atol=1e-10)
    evals = np.linalg.eigvalsh(G)
    assert evals.min() > -1e-8 * evals.max()


def test_isotropic_matern_poisson_2d_end_to_end():
    """2-D Poisson with a truly isotropic (non-product) Matérn prior —
    exercises the radial Gram on the engine path."""
    bvp = lgt.problems.PoissonEquationDirichletProblem(
        domain=lgt.domains.Box([[-1.0, 1.0], [-1.0, 1.0]]),
        rhs=lgt.functions.Constant((2,), 2.0),
        boundary_values=lgt.functions.Constant((2,), 0.0),
    )
    prior = lgt.GaussianProcess(
        lgt.functions.Zero((2,)),
        2.0**2 * lgt.kernels.Matern((2,), nu=2.5, lengthscales=1.0),
    )
    post = prior
    for bc in bvp.boundary_conditions:
        X_bc = np.asarray(bc.boundary.uniform_grid(6, inset=1e-6)).reshape(-1, 2)
        post = post.condition_on_observations(
            np.zeros(X_bc.shape[0]), X=X_bc
        )
    X_pde = np.asarray(bvp.domain.uniform_grid((7, 7))).reshape(-1, 2)
    post = post.condition_on_observations(
        np.full(49, 2.0), X=X_pde, L=bvp.pde.diffop
    )
    Dpost = bvp.pde.diffop(post)
    resid = np.asarray(Dpost.mean(X_pde)) - 2.0
    assert np.max(np.abs(resid)) < 1e-7, np.max(np.abs(resid))
