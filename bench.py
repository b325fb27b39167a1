"""Driver benchmark: Gram build + Cholesky solve wall-clock.

Measures the end-to-end hot path of physics-informed GP conditioning
(the ``train()`` equivalent, SURVEY.md §3.1): assemble the operator-
transformed Gram ``L k L* (X, X)`` for the heat operator on a
TensorProduct Matérn prior, factorize, and solve for the representer
weights — all jitted on the accelerator.

The reference publishes no performance numbers (BASELINE.md): its stack
is single-process CPU numpy/scipy in float64.  ``vs_baseline`` therefore
reports the speedup over a faithful CPU float64 dense implementation of
the same computation (measured at a smaller N and extrapolated by the
exact O(N^2) gram / O(N^3) cholesky scaling laws).

Output: one JSON line
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _build_kernel():
    import linpde_gp_tpu as lgt
    from linpde_gp_tpu.ops import diffops
    from linpde_gp_tpu.ops.transforms import apply_operator_to_kernel

    prior_cov = 1.0 * lgt.kernels.TensorProduct(
        lgt.kernels.Matern((), nu=1.5, lengthscales=2.5),
        lgt.kernels.Matern((), nu=2.5, lengthscales=2.0),
    )
    H = diffops.HeatOperator((2,), alpha=0.1)
    k_hh = apply_operator_to_kernel(
        H, apply_operator_to_kernel(H, prior_cov, argnum=1), argnum=0
    )
    return k_hh


def _accelerator_run(k_hh, X, Y, jitter):
    import jax
    import jax.numpy as jnp

    from linpde_gp_tpu.ops.pallas_gram import gram_matrix

    n = X.shape[0]

    @jax.jit
    def step(x, y):
        gram = gram_matrix(k_hh, x)
        gram = gram + jitter * jnp.eye(n, dtype=gram.dtype)
        chol = jnp.linalg.cholesky(gram)
        w = jax.scipy.linalg.cho_solve((chol, True), y)
        return w

    x_dev = jnp.asarray(X)
    y_dev = jnp.asarray(Y)

    def run_once():
        w = step(x_dev, y_dev)
        w.block_until_ready()
        # Force a device->host readback: some PJRT transports complete
        # block_until_ready at enqueue time.
        wn = np.asarray(w[:8])
        assert np.all(np.isfinite(wn)), "non-finite representer weights"
        return w

    # Warmup / compile.
    run_once()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)
    return min(times)


def _cpu_baseline(k_hh, n_target, jitter):
    """Reference-style CPU float64 dense path, extrapolated to n_target."""
    from linpde_gp_tpu.ops.pallas_gram import kernel_term_specs

    scale, terms = kernel_term_specs(k_hh)
    n_base = int(os.environ.get("BENCH_CPU_N", 4096))
    rng = np.random.default_rng(0)
    X = rng.uniform(-1.0, 1.0, (n_base, 2))
    Y = rng.standard_normal(n_base)

    def eval_factor(kind, s, poly, parity, pref, d):
        if kind == "matern":
            t = s * np.abs(d)
            res = np.full_like(t, poly[-1])
            for c in reversed(poly[:-1]):
                res = res * t + c
            val = res * np.exp(-t)
            if parity:
                val = val * np.sign(d)
        else:
            z = s * d
            res = np.full_like(z, poly[-1])
            for c in reversed(poly[:-1]):
                res = res * z + c
            val = res * np.exp(-(z * z))
        return pref * val

    t0 = time.perf_counter()
    acc = None
    cache = {}
    for coeff, factors in terms:
        term = None
        for i, spec in enumerate(factors):
            key = (i, spec)
            if key not in cache:
                d = X[:, None, i] - X[None, :, i]
                cache[key] = eval_factor(*spec, d)
            val = cache[key]
            term = val if term is None else term * val
        term = coeff * term
        acc = term if acc is None else acc + term
    gram = scale * acc + jitter * np.eye(n_base)
    t_gram = time.perf_counter() - t0

    t0 = time.perf_counter()
    import scipy.linalg

    chol = scipy.linalg.cholesky(gram, lower=True)
    scipy.linalg.cho_solve((chol, True), Y)
    t_chol = time.perf_counter() - t0

    r = n_target / n_base
    return t_gram * r**2 + t_chol * r**3


def _enable_persistent_cache():
    """Persist compiled executables across bench invocations — remote
    compiles through the PJRT tunnel can take minutes cold."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    import jax

    _enable_persistent_cache()

    import linpde_gp_tpu as lgt

    on_tpu = jax.default_backend() == "tpu"
    n = int(os.environ.get("BENCH_N", 32768 if on_tpu else 2048))
    jitter = 1e-5

    k_hh = _build_kernel()
    rng = np.random.default_rng(0)

    def make_data(n):
        # Space-time collocation points (uniform over the heat domain).
        X = np.stack(
            [rng.uniform(0.0, 5.0, n), rng.uniform(-1.0, 1.0, n)], axis=-1
        ).astype(np.float32 if on_tpu else np.float64)
        Y = rng.standard_normal(n).astype(X.dtype)
        return X, Y

    # The tunneled chip can be left with leaked buffers by dead sessions;
    # degrade to a smaller N instead of failing the whole benchmark.
    value = None
    min_n = min(n, 1024)
    while n >= min_n:
        try:
            X, Y = make_data(n)
            value = _accelerator_run(k_hh, X, Y, jitter)
            break
        except Exception as exc:  # noqa: BLE001
            import sys

            print(
                f"# bench: N={n} failed ({type(exc).__name__}); halving",
                file=sys.stderr,
                flush=True,
            )
            n //= 2
    if value is None:
        raise RuntimeError("benchmark failed at every problem size")
    baseline = _cpu_baseline(k_hh, n, jitter)

    print(
        json.dumps(
            {
                "metric": f"heat_LkL_gram_chol_solve_n{n}",
                "value": round(value, 6),
                "unit": "s",
                "vs_baseline": round(baseline / value, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
