"""Chip probe: stage-by-stage finiteness of the anchored rhs at N=1e5.

Round-4 diagnosis of the NaN in ``large_scale_tpu.py`` (iters=0,
relres=nan): checks, in order, the anchor Gram ``A11``, its float32
Cholesky, the (N, n1) Pallas cross-Gram ``W``, the anchor solve ``t1``,
and the CG rhs ``-W t1`` — isolating which device stage first produces
a non-finite value.  Mirrors ``models/iterative.py`` anchor setup
exactly.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"# probe_anchor: {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    if jax.default_backend() == "tpu":
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.ops import diffops
    from linpde_gp_tpu.ops.pallas_gram import gram_matrix
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    on_tpu = jax.default_backend() == "tpu"
    n_pde = int(os.environ.get("PA_N", 100_000 if on_tpu else 2048))
    dtype = np.float32 if on_tpu else np.float64

    k = 1.0 * lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = diffops.HeatOperator((2,), alpha=0.1)
    k_Lk = apply_operator_to_kernel(H, k, argnum=0)

    rng = np.random.default_rng(0)
    X = np.stack(
        [rng.uniform(0.0, 5.0, n_pde), rng.uniform(-1.0, 1.0, n_pde)], axis=-1
    ).astype(dtype)
    n_ic, n_bc = 96, 48
    X_ic = np.stack([np.zeros(n_ic), np.linspace(-1.0, 1.0, n_ic)], axis=-1)
    X_bc = np.concatenate(
        [
            np.stack([np.linspace(0.0, 5.0, n_bc), np.full(n_bc, -1.0)], axis=-1),
            np.stack([np.linspace(0.0, 5.0, n_bc), np.full(n_bc, 1.0)], axis=-1),
        ]
    )
    Xa = np.concatenate([X_ic, X_bc]).astype(dtype)
    Ya = rng.standard_normal(Xa.shape[0]).astype(dtype)

    def stat(name, arr):
        arr = np.asarray(arr)
        finite = bool(np.all(np.isfinite(arr)))
        vals = np.abs(arr[np.isfinite(arr)])
        _log(
            f"{name}: shape={arr.shape} finite={finite} "
            f"absmax={np.max(vals) if vals.size else float('nan'):.3e} "
            f"n_nonfinite={int(np.size(arr) - np.isfinite(arr).sum())}"
        )
        return finite

    A11 = gram_matrix(k, jnp.asarray(Xa), jnp.asarray(Xa))
    stat("A11", A11)
    A11r = A11 + 1e-5 * jnp.eye(Xa.shape[0], dtype=A11.dtype)
    chol1 = jnp.linalg.cholesky(A11r)
    stat("chol1", chol1)

    W = gram_matrix(k_Lk, jnp.asarray(X), jnp.asarray(Xa))
    stat("W", W)

    r1 = jnp.asarray(Ya)
    t1 = jax.scipy.linalg.cho_solve((chol1, True), r1)
    stat("t1", t1)
    rhs = -(W @ t1)
    stat("rhs = -W t1", rhs)

    # Cross-check W against the broadcast (non-Pallas) evaluation on a
    # slice of rows — same math, different code path.
    m = 512
    W_ref = k_Lk.matrix(jnp.asarray(X[:m]), jnp.asarray(Xa))
    err = np.max(np.abs(np.asarray(W[:m]) - np.asarray(W_ref)))
    _log(f"W[:512] vs broadcast eval: max abs err = {err:.3e}")


if __name__ == "__main__":
    main()
