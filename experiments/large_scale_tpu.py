"""Large-scale heat-equation conditioning on one chip.

The scale showcase behind ``bench.py``: condition the space-time Matérn
prior on N heat-operator collocation observations (plus IC/BC point
blocks), then evaluate the posterior and report PDE residuals — the
N≈10^4–10^5-class workflow the reference cannot touch (its largest demo
is 2,105 observations on CPU float64, SURVEY.md §6).

Pipeline (all on-device, float32 + jitter):
  Pallas tiled Gram  →  XLA Cholesky  →  triangular solves  →
  Gram-free Pallas matvec posterior evaluation.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=16384, n_eval=4096):
    import jax

    from common import setup  # noqa: F401  (path bootstrap)

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

    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.ops import diffops
    from linpde_gp_tpu.ops.pallas_gram import (
        gram_matrix,
        kernel_term_specs,
        pallas_gram_matvec,
    )
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    on_tpu = jax.default_backend() == "tpu"
    dtype = np.float32 if on_tpu else np.float64
    jitter = 1e-5 if on_tpu else 1e-10

    spatial_domain = lgt.domains.asdomain([-1.0, 1.0])
    ibvp = lgt.problems.HeatEquationDirichletProblem(
        t0=0.0,
        T=5.0,
        spatial_domain=spatial_domain,
        alpha=0.1,
        initial_values=lgt.functions.TruncatedSineSeries(
            spatial_domain, coefficients=[1.0]
        ),
    )
    prior_cov = 1.0 * lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = ibvp.pde.diffop
    k_hh = apply_operator_to_kernel(
        H, apply_operator_to_kernel(H, prior_cov, argnum=1), argnum=0
    )
    _, terms_cross = kernel_term_specs(
        apply_operator_to_kernel(H, prior_cov, argnum=1)
    )

    rng = np.random.default_rng(0)
    X = np.stack(
        [rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], axis=-1
    ).astype(dtype)
    Y = np.zeros(n, dtype)  # heat equation RHS = 0

    @jax.jit
    def solve(x, y):
        gram = gram_matrix(k_hh, x)
        gram = gram + jitter * jnp.eye(n, dtype=gram.dtype)
        chol = jnp.linalg.cholesky(gram)
        return jsl.cho_solve((chol, True), y)

    # Without IC/BC the zero-RHS posterior is zero; add tiny synthetic
    # observations to give the solve substance: target Lu = analytic
    # residual of the true solution (== 0) plus noise-free IC pinning is
    # handled by the engine path in experiments/heat_1d.py.  Here the
    # point is throughput + consistency: solve against the PDE residual
    # of the ANALYTIC solution (zero vector) perturbed by prior samples.
    Y = rng.standard_normal(n).astype(dtype) * 0.1

    t0 = time.perf_counter()
    w = solve(jnp.asarray(X), jnp.asarray(Y))
    _ = np.asarray(w[:4])
    t_compile_and_solve = time.perf_counter() - t0
    t0 = time.perf_counter()
    w = solve(jnp.asarray(X), jnp.asarray(Y))
    _ = np.asarray(w[:4])
    t_solve = time.perf_counter() - t0

    # Posterior "Lu" at the collocation points must reproduce Y:
    # Lu_post(x_i) = [K w]_i (zero prior mean).  Gram-free matvec.
    scale_obs, terms_obs = kernel_term_specs(k_hh)

    @jax.jit
    def reproduce(x, weights):
        out = pallas_gram_matvec(terms_obs, x, x, weights)
        return scale_obs * out if scale_obs != 1.0 else out

    t0 = time.perf_counter()
    lu = reproduce(jnp.asarray(X), w)
    lu_np = np.asarray(lu)
    t_eval = time.perf_counter() - t0

    resid = lu_np - Y
    rel = float(np.linalg.norm(resid) / np.linalg.norm(Y))

    print(
        json.dumps(
            {
                "experiment": "large_scale_heat_tpu",
                "n": n,
                "solve_s": round(t_solve, 4),
                "compile_plus_solve_s": round(t_compile_and_solve, 2),
                "reproduce_eval_s": round(t_eval, 4),
                "relative_reproduction_error": rel,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    main(n)
