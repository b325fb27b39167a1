"""General (non-half-integer) ``nu`` Matérn — parity with probnum's
numpy Bessel path, which the reference's jax layer lacks
(``covfuncs/_matern.py:46`` raises ``NotImplementedError``).

Oracles: scipy ``kv`` directly, the half-integer closed form at a
half-integer ``nu`` evaluated through the Bessel path, and conditioning
a GP on derivative observations through the autodiff fallback (which
requires the custom-JVP recurrence to be twice differentiable).
"""

import jax
import numpy as np
import pytest
import scipy.special as sps

import linpde_gp_tpu as lgt
from linpde_gp_tpu.ops.kernels import Matern, kv, matern_bessel
from linpde_gp_tpu.ops.transforms import (
    AutodiffTransformedKernel,
    apply_operator_to_kernel,
    as_coefficients,
)

rng = np.random.default_rng(7)


def test_kv_matches_scipy():
    x = np.geomspace(1e-3, 30.0, 64)
    for v in (0.3, 1.0, 2.2, 4.7):
        got = np.asarray(kv(v, x))
        np.testing.assert_allclose(got, sps.kv(v, x), rtol=1e-13)


@pytest.mark.parametrize("nu", [0.7, 2.2, 3.8])
def test_general_nu_matches_scipy_formula(nu):
    l = 0.6
    k = Matern(input_shape=(), nu=nu, lengthscales=l)
    x0 = rng.uniform(-1, 1, 13)
    x1 = rng.uniform(-1, 1, 13)
    x1[3] = x0[3]  # exercise the t == 0 limit
    t = np.sqrt(2 * nu) * np.abs(x0 - x1) / l
    ts = np.where(t > 0, t, 1.0)
    want = np.where(
        t > 0, 2 ** (1 - nu) / sps.gamma(nu) * ts**nu * sps.kv(nu, ts), 1.0
    )
    np.testing.assert_allclose(np.asarray(k(x0, x1)), want, rtol=1e-12)


def test_bessel_path_agrees_with_half_integer_closed_form():
    # Same nu=2.5 evaluated through both code paths must agree.
    l, nu = 0.9, 2.5
    k_closed = Matern(input_shape=(1,), nu=nu, lengthscales=l)
    x0 = rng.uniform(-1, 1, (11, 1))
    x1 = rng.uniform(-1, 1, (11, 1))
    t = np.sqrt(2 * nu) * np.abs(x0 - x1)[:, 0] / l
    got = np.asarray(matern_bessel(nu, t))
    np.testing.assert_allclose(got, np.asarray(k_closed(x0, x1)), rtol=1e-12)


def test_general_nu_diffop_fallback_and_conditioning():
    # d/dx0 of Matern(nu=2.2) through the autodiff fallback: the
    # custom JVP must chain (kv -> kv(v±1)); compare vs finite diff.
    nu, l = 2.2, 0.8
    k = Matern(input_shape=(), nu=nu, lengthscales=l)
    D = lgt.ops.diffops.Derivative(order=1)
    kd = apply_operator_to_kernel(D, k, argnum=0)
    assert isinstance(kd, AutodiffTransformedKernel)
    x0 = np.array([0.3, -0.5, 0.75])
    x1 = np.array([-0.1, 0.4, 0.2])
    h = 1e-6
    fd = (np.asarray(k(x0 + h, x1)) - np.asarray(k(x0 - h, x1))) / (2 * h)
    np.testing.assert_allclose(np.asarray(kd(x0, x1)), fd, atol=1e-7)

    # End-to-end: condition on derivative observations of a known
    # function; posterior mean must interpolate the data.
    Xo = np.linspace(-1, 1, 8)
    u = lgt.GaussianProcess(mean=lgt.functions.Zero(()), cov=k)
    y = np.sin(2 * Xo)
    post = u.condition_on_observations(y, X=Xo)
    m = np.asarray(post.mean(Xo))
    np.testing.assert_allclose(m, y, atol=1e-6)


def test_general_nu_gradient_is_second_order_differentiable():
    nu = 1.7
    k = Matern(input_shape=(), nu=nu, lengthscales=0.5)
    g2 = jax.grad(jax.grad(lambda a: k(a, 0.25)))
    val = float(g2(0.6))
    h = 1e-4
    fd2 = (
        float(k(0.6 + h, 0.25)) - 2 * float(k(0.6, 0.25)) + float(k(0.6 - h, 0.25))
    ) / h**2
    assert abs(val - fd2) < 1e-5
