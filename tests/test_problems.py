"""End-to-end PDE problem tests (reference pattern §4.6,
``tests/linpde_gp/problems/test_heat.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import linpde_gp_tpu as lgt


def test_poisson_1d_dirichlet_converges_to_analytic():
    bvp = lgt.problems.PoissonEquationDirichletProblem(
        domain=lgt.domains.asdomain([-1.0, 1.0]),
        rhs=lgt.functions.Constant((), 2.0),
        boundary_values=(0.0, 1.0),
    )
    assert bvp.solution is not None
    prior = lgt.GaussianProcess(
        lgt.functions.Zero(()),
        2.0**2 * lgt.kernels.ExpQuad((), lengthscales=1.0),
    )
    X_pde = bvp.domain.uniform_grid((20,))
    X_bc, Y_bc = lgt.problems.get_1d_dirichlet_boundary_observations(
        bvp.boundary_conditions
    )
    post = prior.condition_on_observations(
        bvp.pde.rhs(X_pde), X=X_pde, L=bvp.pde.diffop
    ).condition_on_observations(Y_bc, X=X_bc)

    grid = np.linspace(-1, 1, 101)
    err = np.max(np.abs(np.asarray(post.mean(grid)) - np.asarray(bvp.solution(grid))))
    assert err < 1e-6
    std = np.asarray(post.std(grid))
    assert np.all(np.isfinite(std))


def test_poisson_1d_sine_rhs():
    # -u'' = pi^2 sin(pi x), u(+-1) = 0  => u = sin(pi x)
    f = lgt.functions.LambdaFunction(
        lambda x: jnp.pi**2 * jnp.sin(jnp.pi * x), ()
    )
    sol = lgt.functions.LambdaFunction(lambda x: jnp.sin(jnp.pi * x), ())
    bvp = lgt.problems.PoissonEquationDirichletProblem(
        domain=[-1.0, 1.0], rhs=f, boundary_values=np.zeros(2), solution=sol
    )
    prior = lgt.GaussianProcess(
        lgt.functions.Zero(()),
        2.0**2 * lgt.kernels.ExpQuad((), lengthscales=1.0),
    )
    X_pde = bvp.domain.uniform_grid((25,))
    X_bc, Y_bc = lgt.problems.get_1d_dirichlet_boundary_observations(
        bvp.boundary_conditions
    )
    post = prior.condition_on_observations(
        bvp.pde.rhs(X_pde), X=X_pde, L=bvp.pde.diffop
    ).condition_on_observations(Y_bc, X=X_bc)
    grid = np.linspace(-1, 1, 101)
    err = np.max(np.abs(np.asarray(post.mean(grid)) - np.asarray(bvp.solution(grid))))
    assert err < 1e-5


def test_heat_1d_matches_sine_series_solution():
    """The reference's heat test (``problems/test_heat.py:10-60``):
    TensorProduct Matérn prior conditioned on IC + BC + PDE matches the
    analytic solution; 2-sigma band contains the truth."""
    spatial_domain = lgt.domains.asdomain([-1.0, 1.0])
    ibvp = lgt.problems.HeatEquationDirichletProblem(
        t0=0.0,
        T=5.0,
        spatial_domain=spatial_domain,
        alpha=0.1,
        initial_values=lgt.functions.TruncatedSineSeries(
            spatial_domain, coefficients=[1.0]
        ),
    )
    prior = lgt.GaussianProcess(
        lgt.functions.Zero((2,)),
        1.0 * lgt.kernels.TensorProduct(
            lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
            lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
        ),
    )

    X_ic = ibvp.initial_domain.uniform_grid(5, inset=1e-6)
    Y_ic = ibvp.initial_condition.values(X_ic[..., 1])
    post = prior.condition_on_observations(Y_ic, X=np.asarray(X_ic))

    for bc in ibvp.boundary_conditions:
        X_bc = bc.boundary.uniform_grid(25)
        Y_bc = bc.values(X_bc)
        post = post.condition_on_observations(np.asarray(Y_bc), X=np.asarray(X_bc))

    X_pde = ibvp.domain.uniform_grid((40, 15))
    Y_pde = ibvp.pde.rhs(X_pde)
    post = post.condition_on_observations(
        np.asarray(Y_pde), X=np.asarray(X_pde), L=ibvp.pde.diffop
    )

    plt_grid = np.asarray(ibvp.domain.uniform_grid((30, 20))).reshape(-1, 2)
    mean = np.asarray(post.mean(plt_grid))
    sol = np.asarray(ibvp.solution(plt_grid))
    err = np.mean(np.abs(mean - sol))
    assert err < 3e-2, err
    # IC/BC interpolation + 2 sigma containment
    std = np.asarray(post.std(plt_grid))
    assert np.all(np.abs(mean - sol) <= 2 * std + 3e-2)


def test_poisson_2d_product_matern():
    bvp = lgt.problems.PoissonEquationDirichletProblem(
        domain=lgt.domains.Box([[-1.0, 1.0], [-1.0, 1.0]]),
        rhs=lgt.functions.Constant((2,), 2.0),
        boundary_values=lgt.functions.Constant((2,), 0.0),
    )
    prior = lgt.GaussianProcess(
        lgt.functions.Zero((2,)),
        2.0**2 * lgt.kernels.TensorProduct(
            lgt.kernels.Matern((), nu=2.5, lengthscales=1.0),
            lgt.kernels.Matern((), nu=2.5, lengthscales=1.0),
        ),
    )
    post = prior
    for bc in bvp.boundary_conditions:
        X_bc = bc.boundary.uniform_grid(8, inset=1e-6)
        Y_bc = bc.values(np.asarray(X_bc))
        post = post.condition_on_observations(
            np.asarray(Y_bc).reshape(-1), X=np.asarray(X_bc).reshape(-1, 2)
        )
    X_pde = bvp.domain.uniform_grid((8, 8))
    Y_pde = bvp.pde.rhs(X_pde)
    post = post.condition_on_observations(
        np.asarray(Y_pde).reshape(-1),
        X=np.asarray(X_pde).reshape(-1, 2),
        L=bvp.pde.diffop,
    )
    grid = np.asarray(bvp.domain.uniform_grid((12, 12))).reshape(-1, 2)
    mean = np.asarray(post.mean(grid))
    assert np.all(np.isfinite(mean))
    # The PDE is enforced EXACTLY at the collocation points (noiseless
    # conditioning): the operator-posterior mean interpolates the RHS.
    Dpost = bvp.pde.diffop(post)
    resid = np.asarray(Dpost.mean(np.asarray(X_pde).reshape(-1, 2))) - 2.0
    assert np.max(np.abs(resid)) < 1e-8, np.max(np.abs(resid))


def test_poisson_2d_expquad_converges_to_truth():
    """With a smooth product-ExpQuad prior, 10x10 collocation already
    nails the center value of the Fourier-series solution."""
    bvp = lgt.problems.PoissonEquationDirichletProblem(
        domain=lgt.domains.Box([[-1.0, 1.0], [-1.0, 1.0]]),
        rhs=lgt.functions.Constant((2,), 2.0),
        boundary_values=lgt.functions.Constant((2,), 0.0),
    )
    prior = lgt.GaussianProcess(
        lgt.functions.Zero((2,)),
        2.0**2 * lgt.kernels.TensorProduct(
            lgt.kernels.ExpQuad((), lengthscales=1.0),
            lgt.kernels.ExpQuad((), lengthscales=1.0),
        ),
    )
    post = prior
    for bc in bvp.boundary_conditions:
        X_bc = bc.boundary.uniform_grid(10, inset=1e-6)
        post = post.condition_on_observations(
            np.asarray(bc.values(np.asarray(X_bc))).reshape(-1),
            X=np.asarray(X_bc).reshape(-1, 2),
        )
    X_pde = bvp.domain.uniform_grid((10, 10))
    post = post.condition_on_observations(
        np.full(100, 2.0), X=np.asarray(X_pde).reshape(-1, 2), L=bvp.pde.diffop
    )
    # Truth at the center from the double sine series of -lap u = 2.
    truth = 0.5893706973679599
    assert abs(float(post.mean(np.zeros(2))) - truth) < 1e-2


def test_poisson_ivp_polynomial_solution_oracle():
    rhs = lgt.functions.Polynomial((1.0, 2.0, 0.5))
    sol = lgt.problems.Solution_PoissonEquation_IVP_1D_RHSPolynomial(
        (0.0, 1.0), rhs=rhs, initial_values=(0.3, -0.2), alpha=2.0
    )
    # Check -alpha * u'' == rhs and initial conditions.
    xs = np.linspace(0, 1, 9)
    upp = sol.differentiate().differentiate()
    np.testing.assert_allclose(
        -2.0 * np.asarray(upp(xs)), np.asarray(rhs(xs)), atol=1e-12
    )
    np.testing.assert_allclose(float(sol(jnp.asarray(0.0))), 0.3, atol=1e-12)
    np.testing.assert_allclose(
        float(sol.differentiate()(jnp.asarray(0.0))), -0.2, atol=1e-12
    )
