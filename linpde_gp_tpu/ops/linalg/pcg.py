r"""Preconditioned conjugate gradients + Nyström preconditioner.

The reference scales via KeOps' lazy O(N²)-compute/O(N)-memory kernel
reductions (SURVEY.md §5; reference ``covfuncs/_tensor_product.py:111-130``)
but always solves densely.  The gram-free path here replaces the dense
solve with CG over streaming matvecs (``models/iterative.py``); this
module supplies the two pieces that make that path fast on TPU:

- :func:`pcg` — preconditioned CG as a ``lax.while_loop`` (static shapes,
  single compiled program, no host round-trips per iteration), returning
  the iteration count and final relative residual for observability.
- :func:`nystrom_preconditioner` — a rank-``m`` Nyström approximation
  ``K ≈ U Λ Uᵀ`` of the (operator-transformed) kernel matrix, inverted
  in closed form via Woodbury against the noise term:

      P⁻¹ r = U ((Λ + σ²)⁻¹ − σ⁻²) Uᵀ r + σ⁻² r.

  Smooth-kernel Grams have rapidly decaying spectra, so a small ``m``
  captures the dominant eigenspace and PCG converges in O(10) iterations
  where plain CG needs hundreds (the classic randomized-preconditioning
  recipe for kernel ridge regression).  Cost: one (n × m) kernel block,
  one thin SVD — O(n m²) MXU matmuls, O(n m) memory.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PCGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    relative_residual: jnp.ndarray


def pcg(
    matvec: Callable,
    b: jnp.ndarray,
    *,
    M: Callable | None = None,
    tol: float = 1e-6,
    maxiter: int = 512,
    x0: jnp.ndarray | None = None,
) -> PCGResult:
    """Solve ``A x = b`` (A SPD) by preconditioned conjugate gradients.

    ``M`` applies an approximation of ``A⁻¹``.  The loop is a
    ``lax.while_loop`` — jittable, differentiable-free hot path, one
    compiled program regardless of iteration count.
    """
    if M is None:
        M = lambda r: r  # noqa: E731

    b = jnp.asarray(b)
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    r = b - matvec(x) if x0 is not None else b
    z = M(r)
    p = z
    rz = jnp.vdot(r, z)
    b_norm = jnp.linalg.norm(b)
    # Absolute threshold on ||r||; guard b == 0.
    threshold = tol * jnp.where(b_norm > 0, b_norm, 1.0)

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(jnp.linalg.norm(r) > threshold, k < maxiter)

    def body(state):
        x, r, p, rz, k = state
        Ap = matvec(p)
        alpha = rz / jnp.vdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    relres = jnp.linalg.norm(r) / jnp.where(b_norm > 0, b_norm, 1.0)
    return PCGResult(x, k, relres)


def pcg_block(
    matvec: Callable,
    B: jnp.ndarray,
    *,
    M: Callable | None = None,
    tol: float = 1e-6,
    maxiter: int = 512,
) -> PCGResult:
    """Solve ``A X = B`` for a block of right-hand sides SHARING the
    matvec: one ``matvec((n, r))`` application per iteration serves all
    ``r`` columns (each with its own step sizes), so the dominant cost —
    the O(n²) streaming Gram reduction — is amortized r-fold vs ``r``
    independent CG solves.  This is what makes gram-free posterior
    VARIANCE sweeps viable at the 1e5-point scale (VERDICT weak #4).

    Converged columns are frozen (masked updates) so late stragglers
    cannot corrupt finished solutions; the loop ends when every column's
    residual is below ``tol * ||b_col||`` or at ``maxiter``.
    """
    if M is None:
        M = lambda r: r  # noqa: E731

    B = jnp.asarray(B)
    X = jnp.zeros_like(B)
    R = B
    Z = M(R)
    P = Z
    rz = jnp.sum(R * Z, axis=0)  # (r,)
    b_norm = jnp.linalg.norm(B, axis=0)
    threshold = tol * jnp.where(b_norm > 0, b_norm, 1.0)

    def cond(state):
        _, R, _, _, k = state
        return jnp.logical_and(
            jnp.any(jnp.linalg.norm(R, axis=0) > threshold), k < maxiter
        )

    def body(state):
        X, R, P, rz, k = state
        active = jnp.linalg.norm(R, axis=0) > threshold  # (r,)
        AP = matvec(P)
        pAp = jnp.sum(P * AP, axis=0)
        alpha = jnp.where(active, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = M(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        P = Z + beta[None, :] * P
        return X, R, P, jnp.where(active, rz_new, rz), k + 1

    X, R, _, _, k = jax.lax.while_loop(cond, body, (X, R, P, rz, jnp.array(0)))
    relres = jnp.max(jnp.linalg.norm(R, axis=0) / jnp.where(b_norm > 0, b_norm, 1.0))
    return PCGResult(X, k, relres)


class NystromPreconditioner(NamedTuple):
    """Rank-``m`` eigenbasis of the Nyström approximation of the Gram.

    ``U`` is (n, m) with orthonormal columns, ``lam`` the corresponding
    eigenvalue estimates of the *noise-free* kernel matrix, ``sigma_sq``
    the noise term the full system adds to the diagonal.

    Applies the randomized-Nyström preconditioner of Frangella, Tropp &
    Udell (SIMAX 2023): the unresolved tail subspace is damped by
    ``λ_m + σ²`` (the smallest RESOLVED eigenvalue plus noise) rather
    than ``σ²`` alone.  For operator-transformed kernels — whose spectra
    decay slowly because differentiation roughens the kernel — the tail
    is NOT noise-dominated, and the plain Woodbury inverse mis-scales it
    by orders of magnitude (measured on the heat ``H k H*`` Gram:
    preconditioned condition number 5.3e5 plain vs ~λ_m/σ² with tail
    damping).  When the tail is noise-dominated (λ_m ≪ σ²) this reduces
    to the Woodbury formula.
    """

    U: jnp.ndarray
    lam: jnp.ndarray
    sigma_sq: jnp.ndarray

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        # Apply in the RESIDUAL's precision (mixed-precision CG passes
        # float64 vectors against float32 factors — same lesson as
        # ops/linalg/refine.py: an inexactly-applied preconditioner stops
        # being SPD once the residual drops below its noise).  Matmul
        # precision HIGHEST: the TPU bf16 default (~4e-3 rel error)
        # breaks CG outright.
        U = self.U.astype(r.dtype)
        lam = self.lam.astype(r.dtype)
        s2 = self.sigma_sq.astype(r.dtype)
        tail = lam[-1] + s2  # λ_m + σ²: damping of the unresolved tail
        coeff = tail / (lam + s2) - 1.0
        c = coeff if r.ndim == 1 else coeff[:, None]
        hi = jax.lax.Precision.HIGHEST
        ur = jnp.matmul(U.T, r, precision=hi)
        return (jnp.matmul(U, c * ur, precision=hi) + r) / tail


@partial(jax.jit, static_argnames=())
def _nystrom_factors(K_XZ: jnp.ndarray, K_ZZ: jnp.ndarray):
    m = K_ZZ.shape[0]
    n = K_XZ.shape[0]
    # Stabilized pivot factor: W + δI with δ relative to its scale.
    delta = jnp.finfo(K_ZZ.dtype).eps * jnp.trace(K_ZZ) * m
    L = jnp.linalg.cholesky(K_ZZ + delta * jnp.eye(m, dtype=K_ZZ.dtype))
    # B = K_XZ L^{-T}  =>  B Bᵀ = K_XZ W⁻¹ K_ZXᵀ  (the Nyström approximant).
    B = jax.scipy.linalg.solve_triangular(L, K_XZ.T, lower=True).T
    if n >= 8 * m:
        # Tall block: eigendecompose the m x m normal matrix instead of a
        # thin SVD of the n x m block — one (m, n) @ (n, m) MXU matmul +
        # an O(m^3) eigh, orders faster on TPU at north-star sizes
        # (n = 1e5, m = 512).  U = B V S^{-1} reproduces the left
        # singular vectors up to round-off (ample for preconditioning).
        #
        # Trailing eigenpairs at round-off level are NOISE: normalizing
        # their columns by sqrt(lam) ~ 0 manufactures huge spurious
        # directions that destroy the preconditioner's SPD-ness (measured
        # on TPU float32 at n=1e5, m=1024: CG diverges).  Truncate below
        # ~10 eps relative and zero the dropped columns — the tail
        # damping then starts at the smallest KEPT eigenvalue.
        hi = jax.lax.Precision.HIGHEST
        G = jnp.matmul(B.T, B, precision=hi)
        lam, V = jnp.linalg.eigh(G)  # ascending
        lam = jnp.maximum(lam[::-1], 0.0)
        V = V[:, ::-1]
        floor = 100.0 * jnp.finfo(B.dtype).eps * lam[0]
        keep = lam > floor
        s = jnp.sqrt(jnp.where(keep, lam, 1.0))
        U = jnp.matmul(B, V, precision=hi) * jnp.where(keep, 1.0 / s, 0.0)[None, :]
        # Dropped eigenvalues collapse onto the kept minimum so the tail
        # damping (lam[-1] in the preconditioner) is a kept value.
        lam_min_kept = jnp.min(jnp.where(keep, lam, lam[0]))
        lam = jnp.where(keep, lam, lam_min_kept)
        return U, lam
    U, S, _ = jnp.linalg.svd(B, full_matrices=False)
    return U, S**2


def nystrom_preconditioner(
    K_XZ: jnp.ndarray,
    K_ZZ: jnp.ndarray,
    sigma_sq,
) -> NystromPreconditioner:
    """Build the Woodbury inverse of ``Nyström(K) + σ² I``.

    ``K_XZ``: (n, m) kernel block against ``m`` landmark points;
    ``K_ZZ``: (m, m) landmark Gram; ``sigma_sq``: diagonal noise.
    """
    U, lam = _nystrom_factors(jnp.asarray(K_XZ), jnp.asarray(K_ZZ))
    return NystromPreconditioner(U, lam, jnp.asarray(sigma_sq, dtype=U.dtype))


def landmark_indices(n: int, m: int) -> jnp.ndarray:
    """``m`` deterministic, evenly spread landmark indices in ``[0, n)``.

    Evenly strided points are the right default for the quasi-uniform
    collocation grids of PDE problems (no RNG ⇒ reproducible posteriors).
    """
    m = int(min(m, n))
    return jnp.asarray(
        (jnp.arange(m, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) + 0.5)
        * (n / m),
        dtype=jnp.int32,
    )
