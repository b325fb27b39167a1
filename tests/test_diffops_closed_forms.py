"""Closed-form operator-transformed kernels vs the JAX autodiff oracle —
the core correctness strategy of the reference test suite (pattern §4.1,
``tests/.../diffops/test_diffops.py:15-53``), including dispatch-type
assertions and exact diagonal values (where plain autodiff through
``|x0 - x1|`` would silently produce wrong values)."""

import jax.numpy as jnp
import numpy as np
import pytest

import linpde_gp_tpu as lgt
from linpde_gp_tpu.ops import diffops
from linpde_gp_tpu.ops.transforms import (
    AutodiffTransformedKernel,
    SumOfProductsKernel,
    apply_operator_to_kernel,
    as_coefficients,
)

rng = np.random.default_rng(0)


def closed_and_oracle(k, L0, L1):
    kk = k
    if L1 is not None:
        kk = apply_operator_to_kernel(L1, kk, argnum=1)
    if L0 is not None:
        kk = apply_operator_to_kernel(L0, kk, argnum=0)
    oracle = AutodiffTransformedKernel(
        k,
        None if L0 is None else as_coefficients(L0),
        None if L1 is None else as_coefficients(L1),
    )
    return kk, oracle


def assert_matches_oracle(k, L0, L1, input_shape, atol=1e-9):
    kk, oracle = closed_and_oracle(k, L0, L1)
    assert isinstance(kk, SumOfProductsKernel), f"dispatch fell back: {type(kk)}"
    x0 = rng.uniform(-1, 1, (7,) + input_shape)
    x1 = rng.uniform(-1, 1, (6,) + input_shape)
    a = np.asarray(kk(x0[:, None], x1[None, :]))
    b = np.asarray(oracle(x0[:, None], x1[None, :]))
    np.testing.assert_allclose(a, b, atol=atol)
    return kk


@pytest.mark.parametrize("nu", [1.5, 2.5, 3.5, 4.5])
def test_matern_univariate_derivative_pairs(nu):
    p = int(nu)
    k = lgt.kernels.Matern((), nu=nu, lengthscales=0.8)
    for m in range(p + 1):
        for n in range(p + 1):
            if m == n == 0:
                continue
            L0 = diffops.Derivative(m) if m else None
            L1 = diffops.Derivative(n) if n else None
            assert_matches_oracle(k, L0, L1, ())


@pytest.mark.parametrize("nu", [1.5, 2.5])
def test_matern_diagonal_values_finite_and_correct(nu):
    """The Gram diagonal requires closed forms: autodiff through |d|
    produces zeros/NaNs at coincident points."""
    k = lgt.kernels.Matern((), nu=nu, lengthscales=1.0)
    kk = apply_operator_to_kernel(
        diffops.Derivative(1),
        apply_operator_to_kernel(diffops.Derivative(1), k, argnum=1),
        argnum=0,
    )
    # Var[u'(x)] = -phi''(0) for stationary kernels = c^2 * (known value).
    val = float(kk(jnp.asarray(0.3), jnp.asarray(0.3)))
    c2 = 2 * nu  # (sqrt(2 nu)/l)^2 with l=1
    if nu == 1.5:
        expected = c2 * 1.0  # -phi''(0) for (1+t)e^{-t} is 1
    else:
        expected = c2 / 3.0  # for (1+t+t^2/3)e^{-t}: phi'' (0) = -1/3
    np.testing.assert_allclose(val, expected, rtol=1e-12)
    # Off-center limit consistency: closed form is continuous at d=0.
    eps_val = float(kk(jnp.asarray(0.3 + 1e-7), jnp.asarray(0.3)))
    np.testing.assert_allclose(eps_val, val, rtol=1e-5)


def test_expquad_multivariate_laplacian():
    k = lgt.kernels.ExpQuad((2,), lengthscales=[0.7, 1.3])
    L = diffops.Laplacian((2,))
    assert_matches_oracle(k, L, L, (2,))
    assert_matches_oracle(k, None, L, (2,))
    D = diffops.DirectionalDerivative([0.3, -1.2])
    assert_matches_oracle(k, D, L, (2,))
    assert_matches_oracle(k, D, D, (2,))


def test_tensor_product_heat_operator():
    k = lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = diffops.HeatOperator((2,), alpha=0.1)
    assert_matches_oracle(k, H, H, (2,))
    assert_matches_oracle(k, None, H, (2,))


def test_scaled_and_sum_kernel_distribution():
    k = 4.0 * lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=2.5, lengthscales=1.0),
        lgt.kernels.Matern((), nu=2.5, lengthscales=1.0),
    )
    L = diffops.Laplacian((2,))
    kk = apply_operator_to_kernel(L, k, argnum=1)
    from linpde_gp_tpu.ops.kernels import ScaledCovarianceFunction

    assert isinstance(kk, ScaledCovarianceFunction)
    oracle = AutodiffTransformedKernel(k, None, as_coefficients(L))
    x0 = rng.uniform(-1, 1, (5, 2))
    x1 = rng.uniform(-1, 1, (4, 2))
    np.testing.assert_allclose(
        np.asarray(kk(x0[:, None], x1[None, :])),
        np.asarray(oracle(x0[:, None], x1[None, :])),
        atol=1e-10,
    )


def test_second_application_composes_coefficients():
    """Applying a second diffop to an already-transformed kernel must
    compose symbolically (the reference's *_DD_DD registrations)."""
    k = lgt.kernels.Matern((), nu=2.5, lengthscales=1.0)
    d1 = diffops.Derivative(1)
    once = apply_operator_to_kernel(d1, k, argnum=1)
    twice = apply_operator_to_kernel(d1, once, argnum=1)
    direct = apply_operator_to_kernel(diffops.Derivative(2), k, argnum=1)
    x0 = rng.uniform(-1, 1, (5,))
    x1 = rng.uniform(-1, 1, (5,))
    np.testing.assert_allclose(
        np.asarray(twice(x0, x1)), np.asarray(direct(x0, x1)), atol=1e-12
    )


def test_fallback_never_errors():
    """Missing closed forms must fall back to autodiff, never raise
    (reference behavior, ``diffops/_registry.py:15-28``).  A 4th-order
    derivative of Matérn(3/2) has no valid closed form — the dispatch
    must still return an evaluable kernel off the diagonal."""
    k = lgt.kernels.Matern((2,), nu=1.5, lengthscales=1.0)
    L = diffops.Laplacian((2,))
    kk = apply_operator_to_kernel(L, apply_operator_to_kernel(L, k, argnum=1), argnum=0)
    assert isinstance(kk, AutodiffTransformedKernel)
    x0 = rng.uniform(-1, 1, (3, 2))
    x1 = rng.uniform(1.5, 2.5, (3, 2))
    vals = np.asarray(kk(x0, x1))
    assert np.all(np.isfinite(vals))


def test_diffop_on_function_polynomial_exact():
    p = lgt.functions.Polynomial((1.0, 2.0, 3.0, 4.0))  # 1+2x+3x^2+4x^3
    d2 = diffops.Derivative(2)
    result = d2(p)
    assert isinstance(result, lgt.functions.Polynomial)
    np.testing.assert_allclose(result.coefficients, (6.0, 24.0))


def test_diffop_on_function_autodiff():
    f = lgt.functions.LambdaFunction(lambda x: jnp.sin(x), ())
    d2 = diffops.Derivative(2)
    g = d2(f)
    x = jnp.asarray(rng.uniform(-1, 1, (9,)))
    np.testing.assert_allclose(np.asarray(g(x)), -np.sin(np.asarray(x)), atol=1e-12)


def test_laplacian_of_function_2d():
    f = lgt.functions.LambdaFunction(
        lambda x: jnp.sin(x[..., 0]) * jnp.cos(2 * x[..., 1]), (2,)
    )
    L = diffops.Laplacian((2,))
    g = L(f)
    x = jnp.asarray(rng.uniform(-1, 1, (9, 2)))
    expected = -5.0 * np.sin(np.asarray(x)[:, 0]) * np.cos(2 * np.asarray(x)[:, 1])
    np.testing.assert_allclose(np.asarray(g(x)), expected, atol=1e-12)
