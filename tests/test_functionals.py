"""Functional Gram-block equivalence vs scipy quadrature oracles
(reference test pattern §4.2: ``tests/.../crosscov/linfunctls/test_Lk_kL.py``,
``cov/linfunctls/test_LkL.py``) and the multi-output layout contract
(SURVEY.md §7 "hard parts" #1)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate

import linpde_gp_tpu as lgt
from linpde_gp_tpu.ops.crosscov.base import apply_functional_to_crosscov
from linpde_gp_tpu.ops.functionals import (
    DiracFunctional,
    LebesgueIntegral,
    _EvaluationFunctional,
)
from linpde_gp_tpu.ops.transforms import apply_functional

rng = np.random.default_rng(13)


@pytest.mark.parametrize("nu", [1.5, 2.5])
def test_integral_crosscov_vs_scipy_quad(nu):
    """``(∫k)(x) = ∫ k(x, t) dt`` against adaptive quadrature."""
    k = 1.7 * lgt.kernels.Matern((), nu=nu, lengthscales=0.6)
    domain = lgt.domains.Interval(-1.0, 1.0)
    I = LebesgueIntegral(domain)
    crosscov = apply_functional(I, k, argnum=1)
    xs = rng.uniform(-1, 1, 5)
    ours = np.asarray(crosscov(xs))[:, 0]
    expected = np.asarray(
        [
            scipy.integrate.quad(
                lambda t, x=x: float(k(jnp.asarray(x), jnp.asarray(t))), -1, 1
            )[0]
            for x in xs
        ]
    )
    np.testing.assert_allclose(ours, expected, atol=1e-10)


def test_double_integral_gram_vs_scipy_dblquad():
    """``∫∫ k`` Gram entry against dblquad (reference
    ``integrals/_covfunc_lebesgue.py:58-71``)."""
    k = lgt.kernels.Matern((), nu=1.5, lengthscales=0.8)
    domain = lgt.domains.Interval(-0.5, 1.0)
    I = LebesgueIntegral(domain)
    crosscov = apply_functional(I, k, argnum=1)
    gram = apply_functional_to_crosscov(I, crosscov)
    ours = float(gram.matrix[0, 0])
    expected = scipy.integrate.dblquad(
        lambda s, t: float(k(jnp.asarray(s), jnp.asarray(t))),
        -0.5,
        1.0,
        -0.5,
        1.0,
    )[0]
    np.testing.assert_allclose(ours, expected, rtol=1e-9)


def test_integral_of_transformed_kernel_vs_quad():
    """Functional x diffop chaining: ∫ (d²k/dx1²)(x, t) dt."""
    k = lgt.kernels.ExpQuad((), lengthscales=0.7)
    D = lgt.diffops.Derivative(2)
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    kD = apply_operator_to_kernel(D, k, argnum=0)
    I = LebesgueIntegral(lgt.domains.Interval(-1.0, 1.0))
    crosscov = apply_functional(I, kD, argnum=1)
    x = 0.3
    ours = float(crosscov(jnp.asarray(x))[0])
    expected = scipy.integrate.quad(
        lambda t: float(kD(jnp.asarray(x), jnp.asarray(t))), -1, 1
    )[0]
    np.testing.assert_allclose(ours, expected, atol=1e-11)


def test_evaluation_functional_layout_codomain_first():
    """Multi-output Gram flattening: output dims BEFORE batch dims
    (reference ``linfunctls/_evaluation.py:10-27``)."""
    f = lgt.functions.StackedFunction(
        lgt.functions.LambdaFunction(lambda x: x, ()),
        lgt.functions.LambdaFunction(lambda x: 10.0 * x, ()),
    )
    X = np.asarray([1.0, 2.0, 3.0])
    L = _EvaluationFunctional((), (2,), X)
    out = np.asarray(L.apply_to_function(f))
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], X)
    np.testing.assert_allclose(out[1], 10 * X)

    D = DiracFunctional((), (2,), X)
    out_d = np.asarray(D.apply_to_function(f))
    assert out_d.shape == (3, 2)
    np.testing.assert_allclose(out_d[:, 0], X)


def test_multioutput_gram_layout_through_engine():
    """Conditioning a 2-output GP on evaluations: the Gram must follow
    the codomain-first flattening on both axes."""
    prior_cov = lgt.kernels.IndependentMultiOutputCovarianceFunction(
        lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
        lgt.kernels.ExpQuad((), lengthscales=0.4),
    )
    X = rng.uniform(-1, 1, 4)
    L = _EvaluationFunctional((), (2,), X)
    kLa = apply_functional(L, prior_cov, argnum=1)
    gram = apply_functional_to_crosscov(L, kLa).matrix
    assert gram.shape == (8, 8)
    dense = np.asarray(prior_cov.matrix(jnp.asarray(X)))
    np.testing.assert_allclose(np.asarray(gram), dense, atol=1e-12)


def test_conditioning_multioutput_point_observations():
    """Y layout handling for multi-output point observations
    (reference ``_conditional.py:366-388``): Y comes in batch+codomain,
    is re-laid out codomain-first internally."""
    prior = lgt.GaussianProcess(
        mean=lgt.functions.Zero((), (2,)),
        cov=lgt.kernels.IndependentMultiOutputCovarianceFunction(
            lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
            lgt.kernels.ExpQuad((), lengthscales=0.4),
        ),
    )
    X = np.asarray([-0.5, 0.0, 0.5])
    Y = np.stack([np.sin(X), np.cos(X)], axis=-1)  # (3, 2) batch+codomain
    post = prior.condition_on_observations(Y, X=X)
    m = np.asarray(post.mean(X))
    np.testing.assert_allclose(m, Y, atol=1e-8)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5, 3.5])
def test_exact_matern_integral_vs_quadrature(nu):
    """Exact antiderivative closed forms vs the Gauss-Legendre fallback
    AND scipy.quad (reference ``integrals/_matern_lebesgue.py``)."""
    from linpde_gp_tpu.ops.transforms.integrals_exact import (
        exact_integral_hooks,
        matern_double_integral,
    )

    l = 0.8
    k = 2.3 * lgt.kernels.Matern((), nu=nu, lengthscales=l)
    domain = lgt.domains.Interval(-0.7, 1.1)
    I = LebesgueIntegral(domain)
    hook = exact_integral_hooks(k, I)
    assert hook is not None
    crosscov_fn, gram = hook
    xs = rng.uniform(-1.5, 1.5, 7)  # includes points outside the domain
    exact = np.asarray(crosscov_fn(jnp.asarray(xs)))
    # Vectorized kink-split Gauss-Legendre oracle (adaptive scipy.quad
    # over scalar jnp evaluations costs ~100 device calls per node —
    # this is machine-precision and two batched kernel evaluations).
    a, b = -0.7, 1.1
    gl_x, gl_w = np.polynomial.legendre.leggauss(96)

    def gl_interval(lo, hi):
        return 0.5 * (hi - lo) * gl_x + 0.5 * (hi + lo), 0.5 * (hi - lo) * gl_w

    quad = []
    for x in xs:
        s = min(max(x, a), b)  # split at the |x - t| kink (if inside)
        total = 0.0
        for lo, hi in ((a, s), (s, b)):
            if hi > lo:
                t, wt = gl_interval(lo, hi)
                vals = np.asarray(k(jnp.full_like(jnp.asarray(t), x), jnp.asarray(t)))
                total += float(wt @ vals)
        quad.append(total)
    np.testing.assert_allclose(exact, np.asarray(quad), atol=1e-10)

    # Double integral via the stationarity identity
    #   ∫∫_[a,b]² f(|s-t|) ds dt = 2 ∫_0^L (L-u) f(u) du,   L = b-a
    # (smooth on (0, L]; kink only at the endpoint u=0 — GL handles it).
    L_len = b - a
    u, wu = gl_interval(0.0, L_len)
    fu = np.asarray(k(jnp.zeros_like(jnp.asarray(u)), jnp.asarray(u)))
    dbl = float(2.0 * (wu * (L_len - u)) @ fu)
    np.testing.assert_allclose(gram, dbl, rtol=1e-8)

    # The engine routes through the exact path (crosscov + gram).
    crosscov = apply_functional(I, k, argnum=1)
    np.testing.assert_allclose(
        np.asarray(crosscov(jnp.asarray(xs)))[:, 0], exact, atol=1e-12
    )
    block = apply_functional_to_crosscov(I, crosscov)
    np.testing.assert_allclose(float(block.matrix[0, 0]), gram, rtol=1e-12)


def test_conditioning_on_exact_integral_observation():
    """Condition a Matérn GP on an integral observation: the posterior
    integral must interpolate it exactly."""
    domain = lgt.domains.Interval(-1.0, 1.0)
    I = LebesgueIntegral(domain)
    prior = lgt.GaussianProcess(
        lgt.functions.Zero(()),
        lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
    )
    post = prior.condition_on_observations(Y=np.asarray(3.0), L=I)
    rv = I(post)
    np.testing.assert_allclose(float(np.asarray(rv.mean)), 3.0, atol=1e-9)
    assert float(np.asarray(rv.std)) < 1e-5
