"""Incremental (Schur) extension of a distributed Cholesky factor.

SURVEY.md §7 hard part #3: "distributed blocked Cholesky with
incremental (Schur) updates on a mesh — must preserve the
'condition again without refactoring' property".  This generalizes the
reference's 2×2 symbolic Schur machinery
(``linops/_block.py:226-268``) and our single-device
``ops/linalg/chol.chol_extend`` to a mesh-sharded factor:

- The large ``n × n`` factor ``L`` stays row-sharded and is NEVER
  refactorized.
- Appending an observation batch ``(B: n × m, D: m × m)`` costs one
  multi-RHS distributed forward solve ``Y = L⁻¹ B`` (O(n²m / P) riding
  the existing blocked substitution), one small replicated Cholesky of
  the Schur complement ``D − YᵀY``, and O(n·m) storage for the new
  off-diagonal panel — exactly the reference's
  ``BlockMatrix2x2.schur_update`` cost profile, distributed.
- Solves recurse blockwise: forward through ``(L, then L21/L22)``
  chain, backward in reverse — each extension is a replicated dense
  block (observation batches are small relative to the base problem).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import config
from .cholesky import distributed_tri_solve


class DistributedCholFactor:
    """A mesh-sharded lower Cholesky factor plus a chain of Schur
    extensions, supporting ``extend`` and ``solve`` without ever
    refactorizing the base block."""

    def __init__(self, chol: jnp.ndarray, *, mesh: Mesh, block_size: int = 512):
        self.chol = chol
        self.mesh = mesh
        self.block_size = int(block_size)
        self.extensions: list[tuple[jnp.ndarray, jnp.ndarray]] = []

    @property
    def base_size(self) -> int:
        return self.chol.shape[0]

    @property
    def size(self) -> int:
        return self.base_size + sum(l22.shape[0] for _, l22 in self.extensions)

    # ------------------------------------------------------------------
    def _solve_lower(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Forward substitution through the full extended factor.

        ``rhs``: ``(size,)`` or ``(size, k)`` replicated.
        """
        vector = rhs.ndim == 1
        r = rhs[:, None] if vector else rhs
        n0 = self.base_size
        y = distributed_tri_solve(
            self.chol, r[:n0], mesh=self.mesh, block_size=self.block_size
        )
        import jax.lax.linalg as lax_linalg

        parts = [y]
        off = n0
        for l21, l22 in self.extensions:
            m = l22.shape[0]
            y_top = jnp.concatenate(parts, axis=0)
            s = l21 @ y_top
            y_i = lax_linalg.triangular_solve(
                l22, r[off : off + m] - s, left_side=True, lower=True
            )
            parts.append(y_i)
            off += m
        out = jnp.concatenate(parts, axis=0)
        return out[:, 0] if vector else out

    def _solve_upper(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Backward substitution ``Lᵀ x = rhs`` through the chain."""
        import jax.lax.linalg as lax_linalg

        vector = rhs.ndim == 1
        r = rhs[:, None] if vector else rhs
        n0 = self.base_size
        sizes = [l22.shape[0] for _, l22 in self.extensions]
        offs = np.concatenate([[n0], n0 + np.cumsum(sizes)]).astype(int)

        # Solve extensions last-to-first.
        xs: list = [None] * len(self.extensions)
        # Accumulated corrections to the leading rows from already-solved
        # trailing blocks: corr has shape (current prefix size, k).
        corr = jnp.zeros_like(r)
        for i in range(len(self.extensions) - 1, -1, -1):
            l21, l22 = self.extensions[i]
            lo, hi = offs[i], offs[i + 1]
            x_i = lax_linalg.triangular_solve(
                l22,
                r[lo:hi] - corr[lo:hi],
                left_side=True,
                lower=True,
                transpose_a=True,
            )
            xs[i] = x_i
            corr = corr.at[:lo].add(l21.T @ x_i)
        x0 = distributed_tri_solve(
            self.chol,
            r[:n0] - corr[:n0],
            mesh=self.mesh,
            block_size=self.block_size,
            transpose=True,
        )
        out = jnp.concatenate([x0] + xs, axis=0)
        return out[:, 0] if vector else out

    def solve(self, rhs: jnp.ndarray) -> jnp.ndarray:
        """Solve ``(L Lᵀ) x = rhs`` through the extended factor."""
        return self._solve_upper(self._solve_lower(rhs))

    # ------------------------------------------------------------------
    def extend(self, B: jnp.ndarray, D: jnp.ndarray, *, jitter: float | None = None):
        """Append a block row/column: the factor now represents
        ``[[A, B], [Bᵀ, D]]`` where ``A`` is the current matrix.

        ``B``: ``(size, m)`` cross-Gram block; ``D``: ``(m, m)`` SPD.
        Returns ``self`` (mutated), never touching the base factor.
        """
        B = jnp.asarray(B)
        D = jnp.asarray(D)
        m = D.shape[0]
        assert B.shape == (self.size, m)
        y = self._solve_lower(B)  # (size, m)
        schur = D - y.T @ y
        schur = 0.5 * (schur + schur.T)
        if jitter is None:
            jitter = config.cholesky_jitter
        if jitter:
            schur = schur + (jitter * jnp.mean(jnp.diag(schur))) * jnp.eye(
                m, dtype=schur.dtype
            )
        l22 = jnp.linalg.cholesky(schur)
        self.extensions.append((y.T, l22))
        return self

    def logdet(self) -> jnp.ndarray:
        """``log det A`` from the factor diagonals (base diag gathered)."""
        d = jnp.diagonal(self.chol)
        total = 2.0 * jnp.sum(jnp.log(d))
        for _, l22 in self.extensions:
            total = total + 2.0 * jnp.sum(jnp.log(jnp.diagonal(l22)))
        return total
