"""FEM / Galerkin path: L2 projections, weak forms, stiffness matrices,
parametric GPs (reference: ``0002_poisson_dirichlet_fem.ipynb`` /
``_gp_fem.ipynb`` flows; SURVEY.md §3.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

import linpde_gp_tpu as lgt
from linpde_gp_tpu.models.functions import UnivariateLinearInterpolationBasis
from linpde_gp_tpu.ops.functionals import (
    L2Projection_UnivariateLinearInterpolationBasis,
    fem_mass_matrix,
)


def make_bases(num_elements=5, domain=(-1.0, 1.0)):
    grid = np.linspace(domain[0], domain[1], num_elements + 2)
    trial = UnivariateLinearInterpolationBasis(grid, zero_boundary=False)
    test = UnivariateLinearInterpolationBasis(grid, zero_boundary=True)
    return trial, test


def test_hat_basis_partition_of_unity():
    trial, _ = make_bases()
    x = np.linspace(-1, 1, 101)
    vals = np.asarray(trial(x))
    np.testing.assert_allclose(vals.sum(axis=-1), 1.0, atol=1e-12)
    # Nodal interpolation property.
    nodes = trial.x_i
    np.testing.assert_allclose(
        np.asarray(trial(jnp.asarray(nodes))), np.eye(len(trial)), atol=1e-12
    )


def test_mass_matrix_against_quadrature():
    trial, _ = make_bases(4)
    M = fem_mass_matrix(trial)
    x = np.linspace(trial.grid[0], trial.grid[-1], 20001)
    phi = np.asarray(trial(x))
    # Boundary hats jump to zero at the domain edge, so the trapezoid
    # oracle carries an O(h) error there.
    M_quad = np.trapezoid(phi[:, :, None] * phi[:, None, :], x, axis=0)
    np.testing.assert_allclose(M, M_quad, atol=1.5e-4)


def test_l2_projection_of_polynomial():
    trial, _ = make_bases(6)
    proj = L2Projection_UnivariateLinearInterpolationBasis(trial)
    f = lgt.functions.Polynomial((0.5, 1.0, -2.0))
    coeffs = np.asarray(proj(f))
    # The projection minimizes the L2 error: residual must be orthogonal
    # to every basis function.
    x = np.linspace(-1, 1, 20001)
    fvals = np.asarray(f(x))
    phi = np.asarray(trial(x))
    resid = fvals - phi @ coeffs
    inner = np.trapezoid(phi * resid[:, None], x, axis=0)
    np.testing.assert_allclose(inner, 0.0, atol=1e-6)


def test_weak_form_stiffness_matrix():
    trial, test = make_bases(5)
    lap = lgt.diffops.Laplacian(())
    wf = lap.weak_form(test)
    A = wf(trial).todense()
    assert A.shape == (len(test), len(trial))
    # Compare with -int phi' psi' computed by quadrature.
    x = np.linspace(trial.grid[1], trial.grid[-2], 40001)
    h = x[1] - x[0]
    phi_t = np.asarray(test(x))
    psi = np.asarray(trial(x))
    dphi = np.gradient(phi_t, h, axis=0)
    dpsi = np.gradient(psi, h, axis=0)
    A_quad = -np.trapezoid(dphi[:, :, None] * dpsi[:, None, :], x, axis=0)
    np.testing.assert_allclose(np.asarray(A), A_quad, atol=1e-3)


def test_scaled_diffop_weak_form():
    _, test = make_bases(5)
    trial, _ = make_bases(5)
    d = -2.5 * lgt.diffops.Laplacian(())
    wf = d.weak_form(test)
    A = np.asarray(wf(trial).todense())
    A_base = np.asarray(lgt.diffops.Laplacian(()).weak_form(test)(trial).todense())
    np.testing.assert_allclose(A, -2.5 * A_base, atol=1e-12)


def test_gp_fem_galerkin_conditioning():
    """Full GP-FEM flow from the reference notebook: condition on
    Galerkin-projected PDE observations."""
    bvp = lgt.problems.PoissonEquationDirichletProblem(
        domain=lgt.domains.asdomain([-1.0, 1.0]),
        rhs=lgt.functions.Constant((), 2.0),
        boundary_values=(0.0, 1.0),
    )
    trial, test = make_bases(5)
    trial_proj = trial.l2_projection()
    test_proj = test.l2_projection(normalized=False)

    diffop_galerkin = bvp.pde.diffop.weak_form(test)(trial)
    rhs_galerkin = np.asarray(test_proj(bvp.pde.rhs))
    assert rhs_galerkin.shape == (len(test),)

    prior = lgt.GaussianProcess(
        lgt.functions.Zero(()),
        1.0 * lgt.kernels.Matern((), nu=1.5, lengthscales=1.0),
    )
    X_bc, Y_bc = lgt.problems.get_1d_dirichlet_boundary_observations(
        bvp.boundary_conditions
    )
    post = prior.condition_on_observations(Y_bc, X=X_bc)
    post = post.condition_on_observations(
        rhs_galerkin, L=diffop_galerkin @ trial_proj
    )
    grid = np.linspace(-1, 1, 41)
    mean = np.asarray(post.mean(grid))
    sol = np.asarray(bvp.solution(grid))
    assert np.all(np.isfinite(mean))
    # FEM with 5 elements: coarse but must track the solution.
    assert np.max(np.abs(mean - sol)) < 0.25

    # Projected belief as a parametric GP (notebook plotting path).
    Pu = trial_proj(post)
    assert isinstance(Pu, lgt.Normal)
    pu_gp = lgt.models.ParametricGaussianProcess(weights=Pu, feature_fn=trial)
    vals = np.asarray(pu_gp.mean(grid))
    assert np.all(np.isfinite(vals))
    assert np.max(np.abs(vals - mean)) < 0.25
    assert np.all(np.isfinite(np.asarray(pu_gp.std(grid))))


def test_wendland_polynomials_match_literature():
    """Wendland's classic table: phi_{3,1} ∝ (1-r)^4 (4r+1),
    phi_{3,2} ∝ (1-r)^6 (35r^2 + 18r + 3)."""
    from linpde_gp_tpu.ops.kernels import WendlandCovarianceFunction, WendlandPolynomial

    r = np.linspace(0, 1, 33)
    p31 = np.asarray(WendlandPolynomial(3, 1)(r))
    expected = (1 - r) ** 4 * (4 * r + 1)
    np.testing.assert_allclose(p31, expected, atol=1e-12)

    p32 = np.asarray(WendlandPolynomial(3, 2)(r))
    expected2 = (1 - r) ** 6 * (35 * r**2 + 18 * r + 3) / 3.0
    np.testing.assert_allclose(p32, expected2, atol=1e-12)

    k = WendlandCovarianceFunction((2,), k=1, lengthscales=0.5)
    x0 = np.random.default_rng(0).uniform(-1, 1, (9, 2))
    G = np.asarray(k.matrix(jnp.asarray(x0)))
    np.testing.assert_allclose(np.diagonal(G), 1.0, atol=1e-12)
    # Compact support: far pairs are exactly zero.
    far = np.asarray(k(jnp.asarray([0.0, 0.0]), jnp.asarray([0.9, 0.9])))
    assert far == 0.0
    # Positive definite on these points.
    evals = np.linalg.eigvalsh(G)
    assert evals.min() > -1e-12


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, 3.5])
@pytest.mark.parametrize("zero_boundary", [False, True])
def test_exact_matern_hat_projection_crosscov_vs_quadrature(nu, zero_boundary):
    """The closed-form hat-basis projection crosscov (all half-integer ν;
    reference carries ν=3/2 only, ``crosscov/linfunctls/projections.py:131``)
    must match scipy adaptive quadrature to round-off."""
    import scipy.integrate as si

    from linpde_gp_tpu.ops.functionals.projections import (
        BasisIntegralFunctional,
        L2Projection_UnivariateLinearInterpolationBasis,
    )
    from linpde_gp_tpu.ops.transforms.integrals_exact import (
        exact_projection_crosscov,
    )

    grid = np.linspace(-1.0, 1.0, 6)
    basis = UnivariateLinearInterpolationBasis(grid, zero_boundary=zero_boundary)
    k = 1.7 * lgt.kernels.Matern((), nu=nu, lengthscales=0.43)
    x = np.asarray([-0.9, 0.05, 1.3])

    proj = L2Projection_UnivariateLinearInterpolationBasis(basis)
    fn = exact_projection_crosscov(k, proj)
    assert fn is not None
    got = np.asarray(fn(jnp.asarray(x)))

    load = np.zeros((len(x), len(basis)))
    for i in range(len(basis)):
        lo, hi = basis.support_bounds(i)
        for j, xi in enumerate(x):
            load[j, i] = si.quad(
                lambda t: float(basis.eval_elem(i, t))
                * 1.7
                * float(k.covfunc(jnp.asarray(xi), jnp.asarray(t))),
                lo,
                hi,
                limit=200,
                epsabs=1e-13,
                epsrel=1e-13,
            )[0]
    expected = load @ proj.normalizer.T
    np.testing.assert_allclose(got, expected, atol=1e-11)

    # The generic crosscov-contraction path must route through the exact
    # form and agree with the raw load-vector functional too.
    raw = exact_projection_crosscov(k, BasisIntegralFunctional(basis))
    np.testing.assert_allclose(np.asarray(raw(jnp.asarray(x))), load, atol=1e-11)


def test_exact_projection_used_in_conditioning_path():
    """Conditioning on L2-projected observations hits the exact crosscov
    (scalar 1-D Matérn prior) and still reproduces a naive dense solve."""
    from linpde_gp_tpu.ops.crosscov.base import evaluate_crosscov_contraction

    grid = np.linspace(0.0, 1.0, 7)
    basis = UnivariateLinearInterpolationBasis(grid, zero_boundary=True)
    proj = basis.l2_projection()
    k = lgt.kernels.Matern((), nu=1.5, lengthscales=0.3)
    x = jnp.asarray(np.linspace(0, 1, 11))
    vals = np.asarray(evaluate_crosscov_contraction(k, proj, 1, x))
    assert vals.shape == (11, len(basis))

    prior = lgt.GaussianProcess(lgt.functions.Zero(()), k)
    rhs = np.asarray(
        proj.apply_to_function(
            lgt.functions.LambdaFunction(lambda t: jnp.sin(2 * t), (), ())
        )
    ).reshape(-1)
    post = prior.condition_on_observations(rhs, L=proj)
    assert np.all(np.isfinite(np.asarray(post.mean(x))))
    assert np.all(np.isfinite(np.asarray(post.std(x))))


@pytest.mark.parametrize("nu", [0.5, 1.5, 3.5])
@pytest.mark.parametrize("zb", [(True, True), (False, True)])
def test_exact_matern_hat_double_projection_gram(nu, zb):
    """Closed-form hat×hat double-projection Gram (every half-integer ν;
    the reference's exact projection formulas stop at the crosscov level,
    ``crosscov/linfunctls/projections.py``) vs adaptive quadrature of the
    independently-verified exact inner crosscov, split at kink nodes."""
    import scipy.integrate as si

    from linpde_gp_tpu.ops.transforms.integrals_exact import (
        _hat_segment_tables,
        matern_hat_double_projection_gram,
        matern_hat_projection_crosscov,
    )

    zb1, zb2 = zb
    g1 = np.linspace(-1.0, 1.0, 5)
    g2 = np.linspace(-0.8, 1.2, 6)
    b1 = UnivariateLinearInterpolationBasis(g1, zero_boundary=zb1)
    b2 = UnivariateLinearInterpolationBasis(g2, zero_boundary=zb2)
    l = 0.37
    G = np.asarray(matern_hat_double_projection_gram(nu, l, b1, b2))
    inner = matern_hat_projection_crosscov(nu, l, b2)

    a, b, al, be = _hat_segment_tables(b1)

    def hat1(i, x):
        tot = 0.0
        for s in range(2):
            if a[i, s] <= x < b[i, s] or (s == 1 and x == b[i, s]):
                tot += al[i, s] * x + be[i, s]
        return tot

    kinks = np.concatenate([g1, g2])
    Go = np.zeros_like(G)
    for i in range(len(b1)):
        li, hi = b1.support_bounds(i)
        pts = sorted({x for x in kinks if li < x < hi})
        for j in range(len(b2)):
            Go[i, j] = si.quad(
                lambda s: hat1(i, s) * float(inner(jnp.asarray(s))[j]),
                li,
                hi,
                points=pts or None,
                limit=300,
                epsabs=1e-13,
                epsrel=1e-13,
            )[0]
    np.testing.assert_allclose(G, Go, atol=1e-13)


def test_exact_double_projection_routed_in_gram_block():
    """``apply_functional_to_crosscov`` must route L2-projection pairs
    through the exact Gram (incl. normalizers) and agree with the generic
    GL-panel discretization contraction."""
    from linpde_gp_tpu.ops.crosscov.base import (
        KernelFunctionalCrossCov,
        apply_functional_to_crosscov,
    )
    from linpde_gp_tpu.ops.transforms.integrals_exact import (
        exact_projection_gram,
    )

    grid = np.linspace(0.0, 1.0, 7)
    basis = UnivariateLinearInterpolationBasis(grid, zero_boundary=True)
    proj = basis.l2_projection()
    k = 1.3 * lgt.kernels.Matern((), nu=2.5, lengthscales=0.3)
    cc = KernelFunctionalCrossCov(k, proj, argnum=1)

    blk = exact_projection_gram(proj, cc)
    assert blk is not None
    got = np.asarray(apply_functional_to_crosscov(proj, cc).matrix)
    np.testing.assert_allclose(got, np.asarray(blk), atol=1e-14)

    # Independent oracle: GL-panel contraction of the exact inner crosscov.
    disc = proj.discretization()
    vals = cc.evaluate(disc.points)
    ref = np.asarray(disc.weights) @ np.asarray(vals)
    np.testing.assert_allclose(got, ref, atol=1e-9)

    # Symmetry of the projected Gram.
    np.testing.assert_allclose(got, got.T, atol=1e-14)
