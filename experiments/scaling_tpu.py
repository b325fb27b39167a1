"""Single-chip scaling sweep: Gram assembly / Cholesky / solve stage
times across problem sizes (produces the PERFORMANCE.md table).

Uses the same heat-operator-transformed kernel as ``bench.py``.  Each
stage is jitted separately so stage costs are attributable; the JAX
persistent compilation cache keeps recompiles across invocations cheap.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sizes=(4096, 8192, 16384, 32768), reps=3):
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
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
    from linpde_gp_tpu.ops.pallas_gram import gram_matrix
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    on_tpu = jax.default_backend() == "tpu"
    dtype = np.float32 if on_tpu else np.float64

    prior_cov = 1.0 * lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = diffops.HeatOperator((2,), alpha=0.1)
    k_hh = apply_operator_to_kernel(
        H, apply_operator_to_kernel(H, prior_cov, argnum=1), argnum=0
    )
    rng = np.random.default_rng(0)

    gram_fn = jax.jit(lambda x: gram_matrix(k_hh, x))
    chol_fn = jax.jit(
        lambda g: jnp.linalg.cholesky(
            g + 1e-5 * jnp.eye(g.shape[0], dtype=g.dtype)
        )
    )
    solve_fn = jax.jit(lambda L, y: jsl.cho_solve((L, True), y))

    results = []
    for n in sizes:
        X = jnp.asarray(
            np.stack([rng.uniform(0, 5, n), rng.uniform(-1, 1, n)], -1).astype(dtype)
        )
        y = jnp.asarray(rng.standard_normal(n).astype(dtype))

        def timed(fn, *args):
            out = fn(*args)
            _ = np.asarray(jnp.ravel(out)[:4])  # force readback sync
            best = float("inf")
            for _i in range(reps):
                t0 = time.perf_counter()
                out = fn(*args)
                _ = np.asarray(jnp.ravel(out)[:4])
                best = min(best, time.perf_counter() - t0)
            return out, best

        G, t_gram = timed(gram_fn, X)
        L, t_chol = timed(chol_fn, G)
        w, t_solve = timed(solve_fn, L, y)
        assert bool(jnp.all(jnp.isfinite(w[:8])))
        entry = {
            "n": n,
            "gram_s": round(t_gram, 4),
            "chol_s": round(t_chol, 4),
            "solve_s": round(t_solve, 4),
            "total_s": round(t_gram + t_chol + t_solve, 4),
        }
        results.append(entry)
        print(json.dumps(entry), flush=True)
        del G, L, w

    print(json.dumps({"experiment": "scaling_tpu", "results": results}))


if __name__ == "__main__":
    sizes = tuple(int(s) for s in sys.argv[1:]) or (4096, 8192, 16384, 32768)
    main(sizes)
