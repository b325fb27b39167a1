"""Structured-linalg unit tests (reference test pattern §4.4:
``linops/test_block.py``, ``test_symmetric_block.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from linpde_gp_tpu.ops.linalg import (
    Block,
    BlockDiagonal,
    Covariance,
    Dense,
    Diagonal,
    Kronecker,
    cho_solve,
    chol_extend,
    cholesky,
    solve_triangular,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def random_spd(rng, n):
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


def test_cholesky_solve(rng):
    K = random_spd(rng, 12)
    chol = cholesky(jnp.asarray(K))
    b = rng.standard_normal(12)
    x = cho_solve(chol, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(K @ x), b, atol=1e-9)


def test_chol_extend_matches_direct(rng):
    n, m = 10, 4
    K = random_spd(rng, n + m)
    A, B, D = K[:n, :n], K[:n, n:], K[n:, n:]
    chol_A = cholesky(jnp.asarray(A))
    ext = chol_extend(chol_A, jnp.asarray(B), jnp.asarray(D))
    direct = cholesky(jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(ext), np.asarray(direct), atol=1e-9)
    # Solves agree with a dense solve.
    b = rng.standard_normal(n + m)
    x = cho_solve(ext, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(K @ x), b, atol=1e-8)


def test_triangular_solve_trans(rng):
    K = random_spd(rng, 8)
    chol = cholesky(jnp.asarray(K))
    b = rng.standard_normal((8, 3))
    y = solve_triangular(chol, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(chol) @ np.asarray(y), b, atol=1e-10)
    z = solve_triangular(chol, jnp.asarray(b), trans=True)
    np.testing.assert_allclose(np.asarray(chol).T @ np.asarray(z), b, atol=1e-10)


def test_kronecker_matmul(rng):
    A = rng.standard_normal((3, 4))
    B = rng.standard_normal((5, 2))
    op = Kronecker(Dense(A), Dense(B))
    x = rng.standard_normal((8, 6))
    expected = np.kron(A, B) @ x
    np.testing.assert_allclose(np.asarray(op @ x), expected, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.todense()), np.kron(A, B), atol=1e-12)


def test_block_ops(rng):
    blocks = [[rng.standard_normal((2, 3)), rng.standard_normal((2, 4))],
              [rng.standard_normal((5, 3)), rng.standard_normal((5, 4))]]
    op = Block(blocks)
    dense = np.block(blocks)
    np.testing.assert_allclose(np.asarray(op.todense()), dense, atol=1e-12)
    np.testing.assert_allclose(np.asarray(op.T.todense()), dense.T, atol=1e-12)

    bd = BlockDiagonal([Dense(rng.standard_normal((2, 2))), Diagonal(jnp.asarray([1.0, 2.0]))])
    d = np.asarray(bd.todense())
    assert d.shape == (4, 4)
    np.testing.assert_allclose(d[2:, 2:], np.diag([1.0, 2.0]))
    np.testing.assert_allclose(d[:2, 2:], 0.0)


def test_covariance_views():
    arr = jnp.arange(24.0).reshape(2, 3, 4)
    cov = Covariance(arr, (2, 3), (4,))
    assert cov.matrix.shape == (6, 4)
    np.testing.assert_allclose(
        np.asarray(cov.matrix), np.arange(24.0).reshape(6, 4)
    )
    covT = cov.T
    assert covT.shape0 == (4,)
    np.testing.assert_allclose(
        np.asarray(covT.matrix), np.arange(24.0).reshape(6, 4).T
    )


def test_cholesky_auto_jitter_on_singular():
    # Rank-deficient SPD matrix: eager path must still return a finite factor.
    v = jnp.asarray(np.ones((6, 1)))
    gram = v @ v.T
    chol = cholesky(gram)
    assert not bool(jnp.isnan(chol).any())


def test_linop_solve_surface(rng):
    from linpde_gp_tpu.ops.linalg import Dense

    K = random_spd(rng, 7)
    op = Dense(jnp.asarray(K))
    b = rng.standard_normal(7)
    np.testing.assert_allclose(np.asarray(K @ np.asarray(op.solve(b))), b, atol=1e-9)
    L = np.asarray(op.cholesky())
    np.testing.assert_allclose(L @ L.T, K, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray((op.inv() @ jnp.asarray(K))), np.eye(7), atol=1e-8
    )


def test_posterior_checkpoint_roundtrip(rng, tmp_path):
    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.utils.serialization import load_posterior, save_posterior

    prior = lgt.GaussianProcess(
        lgt.functions.Zero(()),
        2.0**2 * lgt.kernels.Matern((), nu=2.5, lengthscales=0.7),
    )
    X = rng.uniform(-1, 1, 6)
    post = prior.condition_on_observations(np.sin(X), X=X, L=lgt.diffops.Derivative(2))
    path = tmp_path / "posterior.pkl"
    save_posterior(path, post)
    restored = load_posterior(path)
    xq = np.linspace(-1, 1, 9)
    np.testing.assert_allclose(
        np.asarray(restored.mean(xq)), np.asarray(post.mean(xq)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(restored.std(xq)), np.asarray(post.std(xq)), atol=1e-12
    )
    # Incremental conditioning continues from the restored state.
    more = restored.condition_on_observations(np.asarray([0.0]), X=np.asarray([0.5]))
    assert np.isfinite(float(more.mean(np.asarray(0.3))))
