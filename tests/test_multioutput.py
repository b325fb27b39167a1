"""Multi-output priors, SelectOutput coupling, and joint inference —
the CPU case-study machinery (reference ``experiments/cpu.py`` +
``0000_cpu_stationary_1d.ipynb``, SURVEY.md §2.14)."""

import numpy as np
import pytest

import linpde_gp_tpu as lgt
from linpde_gp_tpu.ops.diffops import DirectionalDerivative, SelectOutput

rng = np.random.default_rng(5)


def make_prior(width=1.0):
    return lgt.GaussianProcess(
        mean=lgt.functions.StackedFunction(
            lgt.functions.Constant((), 1.0),
            lgt.functions.Constant((), 0.5),
            lgt.functions.Constant((), -0.3),
        ),
        cov=lgt.kernels.IndependentMultiOutputCovarianceFunction(
            3.0**2 * lgt.kernels.Matern((), nu=2.5, lengthscales=0.75 * width),
            0.9**2 * lgt.kernels.Matern((), nu=0.5, lengthscales=width),
            0.9**2 * lgt.kernels.Matern((), nu=0.5, lengthscales=width),
        ),
    )


def test_multioutput_kernel_matrix_block_structure():
    prior = make_prior()
    X = rng.uniform(0, 1, 4)
    G = np.asarray(prior.cov.matrix(X))
    assert G.shape == (12, 12)
    # Output-dims-first flattening: block-diagonal with 4x4 blocks.
    for i in range(3):
        for j in range(3):
            blk = G[4 * i : 4 * (i + 1), 4 * j : 4 * (j + 1)]
            if i != j:
                np.testing.assert_allclose(blk, 0.0)
            else:
                assert np.all(np.diagonal(blk) > 0)


def test_select_output_diffop_composition_uses_closed_forms():
    prior = make_prior()
    select_u = SelectOutput(input_shapes=((), (3,)), idx=0)
    D = lgt.diffops.Derivative(2)
    L = D @ select_u
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel
    from linpde_gp_tpu.ops.transforms.product import SumOfProductsKernel
    from linpde_gp_tpu.ops.kernels import StackCovarianceFunction, ScaledCovarianceFunction

    k1 = apply_operator_to_kernel(L, prior.cov, argnum=1)
    assert isinstance(k1, StackCovarianceFunction)
    entry = k1.covfuncs[0]
    while isinstance(entry, ScaledCovarianceFunction):
        entry = entry.covfunc
    assert isinstance(entry, SumOfProductsKernel), type(entry)
    # Full L k L*: scalar kernel with exact diagonal.
    k2 = apply_operator_to_kernel(L, k1, argnum=0)
    val = np.asarray(k2(np.asarray(0.3), np.asarray(0.3)))
    assert np.isfinite(val) and val > 0


def test_joint_multioutput_inference_end_to_end():
    width = 1.0
    domain = lgt.domains.Interval(0.0, width)
    kappa = 2.0
    prior = make_prior(width)
    select_u = SelectOutput(input_shapes=((), (3,)), idx=0)
    select_qV = SelectOutput(input_shapes=((), (3,)), idx=1)
    select_qA = SelectOutput(input_shapes=((), (3,)), idx=2)
    pde = lgt.problems.PoissonEquation(domain, alpha=kappa)

    X_pde = np.asarray(domain.uniform_grid((7,)))
    post = prior.condition_on_observations(
        Y=np.zeros_like(X_pde), L=pde.diffop @ select_u - select_qV, X=X_pde
    )
    post = post.condition_on_observations(
        Y=np.asarray(0.0),
        L=(-kappa * DirectionalDerivative(np.asarray(1.0))) @ select_u - select_qA,
        X=np.asarray(0.0),
    )
    X_dts = np.asarray([0.2, 0.5, 0.8])
    post = post.condition_on_observations(
        Y=np.asarray([1.0, 1.2, 1.1]),
        L=select_u,
        X=X_dts,
        b=lgt.Normal(np.zeros(3), 0.05**2 * np.eye(3)),
    )
    L_stat = (
        2.0 * lgt.functionals.LebesgueIntegral(input_domain=domain) @ select_qV
        + 2.0
        * (
            select_qA.to_linfunctl(np.asarray(width))
            + select_qA.to_linfunctl(np.asarray(0.0))
        )
    )
    post = post.condition_on_observations(Y=np.asarray(0.0), L=L_stat)

    grid = np.linspace(0, 1, 11)
    mean = np.asarray(post.mean(grid))
    std = np.asarray(post.std(grid))
    assert mean.shape == (11, 3) and std.shape == (11, 3)
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(std))

    # The noiseless aggregate statistic is interpolated exactly.
    stat_rv = L_stat(post)
    np.testing.assert_allclose(float(np.asarray(stat_rv.mean)), 0.0, atol=1e-8)
    assert float(np.asarray(stat_rv.std)) < 1e-4

    # DTS u-measurements are honored within noise.
    u_post = select_u(post)
    u_at_dts = np.asarray(u_post.mean(X_dts))
    np.testing.assert_allclose(u_at_dts, [1.0, 1.2, 1.1], atol=0.2)

    # SelectOutput pushforward shares the Gram factor.
    assert u_post.gram_cholesky is post.gram_cholesky


def test_multioutput_posterior_covariance_vs_naive():
    """Posterior cov with codomain axes matches a hand-rolled joint
    conditioner (covers the outer-product broadcast path)."""
    import jax.numpy as jnp

    prior_cov = lgt.kernels.IndependentMultiOutputCovarianceFunction(
        lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
        lgt.kernels.ExpQuad((), lengthscales=0.4),
    )
    prior = lgt.GaussianProcess(lgt.functions.Zero((), (2,)), prior_cov)
    X = np.asarray([-0.5, 0.0, 0.5])
    Y = np.stack([np.sin(X), np.cos(X)], axis=-1)
    post = prior.condition_on_observations(Y, X=X)

    K = np.asarray(prior_cov.matrix(jnp.asarray(X)))
    Kinv = np.linalg.inv(K)
    xq = np.asarray([0.2, -0.8])
    cov_eval = np.asarray(post.cov(xq, xq))
    kqq = np.asarray(prior_cov(jnp.asarray(xq), jnp.asarray(xq)))
    for b, x in enumerate(xq):
        kx = np.asarray(
            prior_cov.matrix(jnp.asarray(np.asarray([x])), jnp.asarray(X))
        )
        naive = kqq[b] - kx @ Kinv @ kx.T
        np.testing.assert_allclose(cov_eval[b], naive, atol=1e-12)
