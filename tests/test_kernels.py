"""Kernel unit tests (reference pattern §4.5: values vs hand-computed
formulas, tensor-product/Kronecker structure, flattening contracts)."""

import jax.numpy as jnp
import numpy as np
import pytest

import linpde_gp_tpu as lgt
from linpde_gp_tpu.models.domains import TensorProductGrid

rng = np.random.default_rng(21)


def test_expquad_value():
    k = lgt.kernels.ExpQuad((), lengthscales=2.0)
    d = 0.7
    np.testing.assert_allclose(
        float(k(jnp.asarray(0.0), jnp.asarray(d))),
        np.exp(-0.5 * (d / 2.0) ** 2),
        rtol=1e-12,
    )


@pytest.mark.parametrize(
    "nu,formula",
    [
        (0.5, lambda t: np.exp(-t)),
        (1.5, lambda t: (1 + t) * np.exp(-t)),
        (2.5, lambda t: (1 + t + t**2 / 3) * np.exp(-t)),
        (3.5, lambda t: (1 + t + 2 * t**2 / 5 + t**3 / 15) * np.exp(-t)),
    ],
)
def test_matern_closed_form_values(nu, formula):
    """Classic Rasmussen–Williams half-integer Matérn formulas."""
    l = 0.8
    k = lgt.kernels.Matern((), nu=nu, lengthscales=l)
    d = np.abs(rng.uniform(-2, 2, 7))
    t = np.sqrt(2 * nu) * d / l
    np.testing.assert_allclose(
        np.asarray(k(jnp.zeros(7), jnp.asarray(d))), formula(t), rtol=1e-12
    )


def test_matern_inf_equals_expquad():
    k_inf = lgt.kernels.Matern((2,), nu=np.inf, lengthscales=0.9)
    k_eq = lgt.kernels.ExpQuad((2,), lengthscales=0.9)
    x0 = rng.uniform(-1, 1, (5, 2))
    x1 = rng.uniform(-1, 1, (5, 2))
    np.testing.assert_allclose(
        np.asarray(k_inf(x0, x1)), np.asarray(k_eq(x0, x1)), rtol=1e-12
    )


def test_tensor_product_equals_product():
    ka = lgt.kernels.Matern((), nu=1.5, lengthscales=0.5)
    kb = lgt.kernels.ExpQuad((), lengthscales=1.1)
    kt = lgt.kernels.TensorProduct(ka, kb)
    x0 = rng.uniform(-1, 1, (6, 2))
    x1 = rng.uniform(-1, 1, (6, 2))
    np.testing.assert_allclose(
        np.asarray(kt(x0, x1)),
        np.asarray(ka(x0[:, 0], x1[:, 0])) * np.asarray(kb(x0[:, 1], x1[:, 1])),
        rtol=1e-12,
    )


def test_tensor_product_kronecker_gram_on_grids():
    """Kronecker linop Gram on TensorProductGrids matches dense pairwise
    (reference ``covfuncs/_tensor_product.py:64-82``)."""
    kt = lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
        lgt.kernels.ExpQuad((), lengthscales=1.2),
    )
    grid = TensorProductGrid(np.linspace(0, 1, 4), np.linspace(-1, 1, 3))
    op = kt.linop(grid)
    from linpde_gp_tpu.ops.linalg import Kronecker

    assert isinstance(op, Kronecker)
    dense = np.asarray(kt.matrix(jnp.asarray(np.asarray(grid).reshape(-1, 2))))
    np.testing.assert_allclose(np.asarray(op.todense()), dense, atol=1e-12)
    # Matvec through the structure.
    v = rng.standard_normal(12)
    np.testing.assert_allclose(np.asarray(op @ v), dense @ v, atol=1e-12)


def test_uniform_grid_returns_tensor_product_grid():
    box = lgt.domains.Box([[0.0, 1.0], [0.0, 2.0]])
    grid = box.uniform_grid((4, 5))
    assert isinstance(grid, TensorProductGrid)
    assert np.asarray(grid).shape == (4, 5, 2)
    assert len(grid.factors) == 2


def test_gram_matrix_matches_pairwise_flattening():
    k = lgt.kernels.Matern((), nu=2.5, lengthscales=0.7)
    X0 = rng.uniform(-1, 1, 5)
    X1 = rng.uniform(-1, 1, 3)
    G = np.asarray(k.matrix(jnp.asarray(X0), jnp.asarray(X1)))
    for i in range(5):
        for j in range(3):
            np.testing.assert_allclose(
                G[i, j],
                float(k(jnp.asarray(X0[i]), jnp.asarray(X1[j]))),
                rtol=1e-12,
            )


def test_kernel_arithmetic():
    k = 2.0 * lgt.kernels.ExpQuad((), lengthscales=1.0) + lgt.kernels.Matern(
        (), nu=1.5, lengthscales=1.0
    )
    x0, x1 = jnp.asarray(0.2), jnp.asarray(-0.4)
    expected = 2.0 * float(
        lgt.kernels.ExpQuad((), lengthscales=1.0)(x0, x1)
    ) + float(lgt.kernels.Matern((), nu=1.5, lengthscales=1.0)(x0, x1))
    np.testing.assert_allclose(float(k(x0, x1)), expected, rtol=1e-12)


def test_zero_kernel():
    k = lgt.kernels.ZeroCovarianceFunction(())
    x = rng.uniform(-1, 1, 4)
    np.testing.assert_allclose(np.asarray(k(x, x)), 0.0)


def test_transformed_tensor_product_sum_of_kronecker_linop():
    """Operator-transformed TP kernel Gram on grids factorizes into a sum
    of Kronecker products (reference ``diffops/_tensor_product.py:140-156``)."""
    from linpde_gp_tpu.ops.linalg.linops import SumOperator
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    kt = lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = lgt.diffops.HeatOperator((2,), alpha=0.1)
    kk = apply_operator_to_kernel(
        H, apply_operator_to_kernel(H, kt, argnum=1), argnum=0
    )
    grid = lgt.domains.Box([[0.0, 5.0], [-1.0, 1.0]]).uniform_grid((6, 5))
    op = kk.linop(grid)
    assert isinstance(op, SumOperator)
    dense = np.asarray(kk.matrix(jnp.asarray(np.asarray(grid).reshape(-1, 2))))
    np.testing.assert_allclose(np.asarray(op.todense()), dense, atol=1e-12)
    v = rng.standard_normal(30)
    np.testing.assert_allclose(np.asarray(op @ v), dense @ v, atol=1e-12)
