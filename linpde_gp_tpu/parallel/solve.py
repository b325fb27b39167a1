"""One-shot distributed conditioning: sharded Gram → padded distributed
Cholesky → distributed solve.

Arbitrary N is handled by padding the Gram with an identity block (the
factor of ``blockdiag(K, I)`` is ``blockdiag(chol(K), I)``, and zero-
padded right-hand sides stay zero through both triangular solves).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import config
from .cholesky import (
    distributed_chol_solve,
    distributed_cholesky,
    distributed_cholesky_cyclic,
)
from .gram import sharded_gram


def _pad_multiple(n: int, quantum: int) -> int:
    return ((n + quantum - 1) // quantum) * quantum


def distributed_condition(
    kernel,
    X,
    Y,
    *,
    mesh: Mesh,
    noise_variance: float = 0.0,
    block_size: int = 256,
    jitter: float | None = None,
    layout: str = "cyclic",
):
    """Compute representer weights ``(K + sigma^2 I)^{-1} (Y)`` with every
    stage sharded over the mesh.

    ``layout="cyclic"`` (default) uses the load-balanced block-cyclic
    factorization (``n³/(3P)`` FLOPs per device — the parallel ideal);
    ``"contiguous"`` keeps the simpler row-slab variant.

    Returns ``(weights, chol)`` with ``chol`` row-sharded (padded size).
    """
    X = jnp.asarray(X)
    Y = jnp.asarray(Y).reshape(-1)
    n = Y.shape[0]
    num_devices = mesh.devices.size
    quantum = num_devices * block_size
    n_pad = _pad_multiple(max(n, quantum), quantum)

    gram = sharded_gram(kernel, X, mesh=mesh)
    if jitter is None:
        jitter = config.cholesky_jitter
    diag_bump = noise_variance + jitter
    if diag_bump:
        gram = gram + diag_bump * jnp.eye(n, dtype=gram.dtype)

    if n_pad != n:
        padded = jnp.eye(n_pad, dtype=gram.dtype)
        padded = padded.at[:n, :n].set(gram)
        gram = padded
        Y = jnp.concatenate([Y, jnp.zeros(n_pad - n, Y.dtype)])

    nblocks = n_pad // block_size
    if layout == "cyclic" and nblocks <= 128:
        # Fully-unrolled static program; fall back to the fori_loop
        # contiguous variant when the unroll would blow up compile time.
        chol = distributed_cholesky_cyclic(gram, mesh=mesh, block_size=block_size)
    else:
        chol = distributed_cholesky(gram, mesh=mesh, block_size=block_size)
    weights = distributed_chol_solve(chol, Y, mesh=mesh, block_size=block_size)
    return weights[:n], chol
